"""Fused, fully-jittable per-frame computation for benchmarking and
AOT compile checks: image + LiDAR cloud in → features + pose out, one XLA
program, no host round-trips.

This is the single-chip "forward step" of the engine: ORB extraction
(pyramid/FAST/BRIEF), LiDAR depth densification, descriptor association
against the previous frame's landmarks, and the 4-round robust pose
solve — i.e. the per-frame hot path of SURVEY.md §3.2 as one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.ops import matching
from orb_slam3_rgbl_tpu.optim import pose_opt
from orb_slam3_rgbl_tpu.slam import frame as frame_mod


def make_frame_step(cfg: SlamConfig):
    """Returns a jittable ``fn(img, points, prev_desc, prev_valid,
    prev_Xw, Tcw_init) -> (Tcw, n_inliers, FrameFeatures)``."""
    import numpy as np
    from orb_slam3_rgbl_tpu.ops import depth as depth_ops

    cam = cfg.camera
    H, W = cam.height, cam.width
    lc = cfg.lidar
    n_levels = cfg.orb.n_levels
    inv_s2 = frame_mod.inv_scale_sigma2(n_levels, cfg.orb.scale_factor)
    K_np = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
    P_lidar = depth_ops.lidar_projection_matrix(K_np, np.asarray(lc.T_velo_cam))

    def fn(img, points, prev_desc, prev_valid, prev_Xw, Tcw_init):
        feats = frame_mod.extract_features(
            img, H, W,
            n_features=cfg.orb.n_features, n_levels=n_levels,
            scale_factor=cfg.orb.scale_factor,
            ini_th=float(cfg.orb.ini_th_fast), min_th=float(cfg.orb.min_th_fast),
        )
        P = jnp.asarray(P_lidar)
        feats, _ = frame_mod.attach_lidar_depth(
            feats, points, P, H, W, cam.bf,
            min_dist=lc.min_dist, max_dist=lc.max_dist, method=lc.method,
            dil_kind=lc.dil_kernel_type, dil_ku=lc.dil_kernel_size_u,
            dil_kv=lc.dil_kernel_size_v,
        )

        # associate previous-frame landmarks → current features (brute
        # MXU distance + mutual best, the TrackReferenceKeyFrame path)
        d = matching.distance_table(prev_desc, feats.desc, prev_valid, feats.valid)
        idx, _ = matching.mutual_best_match(d, check_rotation=False, th=matching.TH_LOW, ratio=0.8)
        matched = idx >= 0
        safe = jnp.clip(idx, 0, feats.uv.shape[0] - 1)
        obs = pose_opt.PoseObs(
            Xw=prev_Xw,
            uv=feats.uv[safe],
            u_right=feats.u_right[safe],
            inv_sigma2=inv_s2[jnp.clip(feats.octave[safe], 0, n_levels - 1)],
            valid=matched & prev_valid,
        )
        res = pose_opt.pose_optimize(Tcw_init, obs, cam)
        return res.Tcw, res.n_inliers, feats

    return fn


def example_inputs(cfg: SlamConfig, n_points: int = 131072, seed: int = 0):
    """Representative KITTI-regime inputs (1241×376 gray @ 2000 feats,
    ~120k LiDAR points)."""
    cam = cfg.camera
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = jax.random.uniform(k1, (cam.height, cam.width), jnp.float32) * 255.0
    # plausible forward-driving cloud (x forward in velodyne frame)
    pts = jnp.stack(
        [
            jax.random.uniform(k2, (n_points,), minval=6.0, maxval=80.0),
            jax.random.uniform(k3, (n_points,), minval=-30.0, maxval=30.0),
            jax.random.uniform(k4, (n_points,), minval=-2.0, maxval=3.0),
            jnp.ones((n_points,)),
        ],
        axis=1,
    ).astype(jnp.float32)
    N = cfg.orb.n_features
    prev_desc = jax.random.randint(k1, (N, 8), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    prev_valid = jnp.ones((N,), bool)
    prev_Xw = jnp.stack(
        [
            jax.random.uniform(k2, (N,), minval=-20.0, maxval=20.0),
            jax.random.uniform(k3, (N,), minval=-5.0, maxval=5.0),
            jax.random.uniform(k4, (N,), minval=8.0, maxval=60.0),
        ],
        axis=1,
    ).astype(jnp.float32)
    Tcw0 = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    return img, pts, prev_desc, prev_valid, prev_Xw, Tcw0
