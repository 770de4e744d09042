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
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.geometry import lie
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


# ======================================================================
# Fused engine tracking step — the REAL per-frame hot path as one XLA
# program. This is what ``Tracker.track_image`` dispatches every frame
# in state OK; the host only touches scalars + (N,) binding vectors.
#
# Covers reference ``Tracking::Track`` stages (Tracking.cc:1828-2367):
#   Frame ctor (extraction + LiDAR depth)      Frame.cc:289-378
#   TrackWithMotionModel                       Tracking.cc:2888
#     SearchByProjection(cur, last, th)        ORBmatcher.cc
#     PoseOptimization                         Optimizer.cc:814
#   TrackLocalMap                              Tracking.cc:2983
#     SearchLocalPoints (frustum + projection) Tracking.cc:3377
#     PoseOptimization                         Optimizer.cc:814
# The local map is a device-resident landmark *window* refreshed by the
# host only when the map version changes (≈ per keyframe), replacing the
# per-frame UpdateLocalMap covisibility scan.
# ======================================================================


class TrackStepOut(NamedTuple):
    Tcw: jax.Array            # (7,) final pose
    n_inliers: jax.Array      # () i32 — final TrackLocalMap inliers
    n_mm_inliers: jax.Array   # () i32 — motion-model stage inliers
    bind_prev: jax.Array      # (N,) i32 → prev-frame feature slot or −1
    bind_win: jax.Array       # (N,) i32 → local-window slot or −1
    feats: frame_mod.FrameFeatures
    next_Xw: jax.Array        # (N, 3) landmark position per bound feature
    next_bound: jax.Array     # (N,) bool
    win_visible: jax.Array    # (LW,) bool — frustum-passed window slots
    n_tracked_close: jax.Array    # () i32 — KF policy scalars
    n_nontracked_close: jax.Array  # () i32
    # everything the host control loop reads, as ONE f32 vector —
    # [n_inl, n_mm, n_tc, n_ntc, Tcw(7), bind_prev(N), bind_win(N),
    # win_visible(LW)] — so the per-frame host sync is a single
    # device→host transfer (each separate fetch pays a tunnel RTT)
    packed: jax.Array         # (4 + 7 + 2N + LW,) f32


def _resolve_collisions(idx: jax.Array, dist: jax.Array, n_feat: int):
    """Per-projection matches (P,)→feature → injective per-feature
    bindings (N,)→projection, keeping the lowest distance (ties broken by
    slot). Replaces the host-side stable-sort in ``Tracker._match_and_bind``."""
    P = idx.shape[0]
    matched = idx >= 0
    safe = jnp.where(matched, idx, n_feat)  # out-of-range → dropped
    key = jnp.where(matched, dist * 16384.0 + jnp.arange(P, dtype=jnp.float32),
                    jnp.float32(jnp.inf))
    best = jnp.full((n_feat,), jnp.inf, jnp.float32).at[safe].min(key, mode="drop")
    winner = matched & (key <= best[jnp.clip(safe, 0, n_feat - 1)])
    bind = jnp.full((n_feat,), -1, jnp.int32).at[
        jnp.where(winner, safe, n_feat)
    ].set(jnp.arange(P, dtype=jnp.int32), mode="drop")
    return bind


def make_track_step(cfg: SlamConfig, window_cap: int = 8192,
                    mm_th: float = 15.0, local_th: float = 4.0,
                    mode: str = "rgbl"):
    """Returns a jittable full tracking step.

    fn(img, depth_src, depth_valid, Tcw_pred,
       prev_uv, prev_desc, prev_oct, prev_angle, prev_Xw, prev_bound,
       win_pos, win_desc, win_maxdist, win_valid) -> TrackStepOut

    ``mode``:
      * 'rgbl' — ``depth_src`` is a FIXED-capacity (Np, 4) LiDAR cloud
        with ``depth_valid`` masking real returns (varying per-frame
        sizes must not force recompiles; the host pads/truncates).
      * 'rgbd' — ``depth_src`` is the (H, W) dense depth image
        (``Frame::ComputeStereoFromRGBD``); ``depth_valid`` is ignored.
      * 'mono' — no depth source (``depth_src``/``depth_valid`` ignored);
        features stay depth-free and every residual is monocular.
    """
    import numpy as np
    from orb_slam3_rgbl_tpu.ops import depth as depth_ops

    cam = cfg.camera
    H, W = cam.height, cam.width
    lc = cfg.lidar
    n_levels = cfg.orb.n_levels
    log_sf = float(np.log(cfg.orb.scale_factor))
    inv_s2 = frame_mod.inv_scale_sigma2(n_levels, cfg.orb.scale_factor)
    sf = jnp.asarray([cfg.orb.scale_factor ** l for l in range(n_levels)], jnp.float32)
    K_np = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
    P_lidar = jnp.asarray(depth_ops.lidar_projection_matrix(K_np, np.asarray(lc.T_velo_cam)))
    th_depth_m = cam.bf * cam.th_depth / cam.fx

    def project(Tcw, X):
        pc = lie.se3_apply(Tcw, X)
        z = pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        ok = (z > 0.1) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        return jnp.stack([u, v], axis=1), ok, pc

    def solve(Tcw0, feats, Xw, bound):
        obs = pose_opt.PoseObs(
            Xw=Xw, uv=feats.uv, u_right=feats.u_right,
            inv_sigma2=inv_s2[jnp.clip(feats.octave, 0, n_levels - 1)],
            valid=bound & feats.valid,
        )
        return pose_opt.pose_optimize(Tcw0, obs, cam)

    def fn(img, depth_src, depth_valid, Tcw_pred,
           prev_uv, prev_desc, prev_oct, prev_angle, prev_Xw, prev_bound,
           win_pos, win_desc, win_maxdist, win_valid):
        del prev_uv  # (kept in the signature for future pyramid reuse)
        # ---- Frame ctor: extraction + depth ----------------------------
        feats = frame_mod.extract_features(
            img, H, W, n_features=cfg.orb.n_features, n_levels=n_levels,
            scale_factor=cfg.orb.scale_factor,
            ini_th=float(cfg.orb.ini_th_fast), min_th=float(cfg.orb.min_th_fast),
        )
        if mode == "mono":
            pass
        elif mode == "rgbd":
            feats = frame_mod.attach_depth_map(feats, depth_src, cam.bf)
        else:
            feats, _ = frame_mod.attach_lidar_depth(
                feats, depth_src, P_lidar, H, W, cam.bf,
                min_dist=lc.min_dist, max_dist=lc.max_dist, method=lc.method,
                dil_kind=lc.dil_kernel_type, dil_ku=lc.dil_kernel_size_u,
                dil_kv=lc.dil_kernel_size_v, valid_mask=depth_valid,
            )
        N = feats.uv.shape[0]

        # ---- TrackWithMotionModel --------------------------------------
        proj1, ok1, _ = project(Tcw_pred, prev_Xw)
        ok1 &= prev_bound
        r1 = mm_th * sf[jnp.clip(prev_oct, 0, n_levels - 1)]
        idx1, d1 = matching.windowed_projection_match(
            proj1, ok1, prev_desc, prev_oct, feats.uv, feats.valid,
            feats.desc, feats.octave, r1, th=matching.TH_HIGH,
            proj_angle=prev_angle, kp_angle=feats.angle,
        )
        bind1 = _resolve_collisions(idx1, d1, N)
        Xw1 = prev_Xw[jnp.clip(bind1, 0, N - 1)]
        res1 = pose_opt.pose_optimize(
            Tcw_pred,
            pose_opt.PoseObs(
                Xw=Xw1, uv=feats.uv, u_right=feats.u_right,
                inv_sigma2=inv_s2[jnp.clip(feats.octave, 0, n_levels - 1)],
                valid=(bind1 >= 0) & feats.valid,
            ),
            cam,
        )
        keep1 = (bind1 >= 0) & res1.inliers & feats.valid
        # motion-model failure → fall back to the prediction pose for the
        # local-map stage (host decides the classic fallback from n_mm)
        pose1 = jnp.where(res1.n_inliers >= 10, res1.Tcw, Tcw_pred)

        # ---- TrackLocalMap: window search ------------------------------
        proj2, ok2, pc2 = project(pose1, win_pos)
        ok2 &= win_valid
        center = lie.se3_trans(lie.se3_inv(pose1))
        dist_w = jnp.linalg.norm(win_pos - center[None, :], axis=-1)
        ratio = win_maxdist / jnp.maximum(dist_w, 1e-6)
        oct2 = jnp.clip(
            jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-6)) / log_sf), 0, n_levels - 1
        ).astype(jnp.int32)
        r2 = local_th * sf[oct2]
        idx2, d2 = matching.windowed_projection_match(
            proj2, ok2, win_desc, oct2, feats.uv, feats.valid & ~keep1,
            feats.desc, feats.octave, r2, th=matching.TH_HIGH,
        )
        bind2 = _resolve_collisions(idx2, d2, N)
        bind2 = jnp.where(keep1, -1, bind2)

        from2 = bind2 >= 0
        Xw = jnp.where(keep1[:, None], Xw1,
                       jnp.where(from2[:, None],
                                 win_pos[jnp.clip(bind2, 0, window_cap - 1)], 0.0))
        bound = keep1 | from2
        res2 = solve(pose1, feats, Xw, bound)
        inl = res2.inliers & bound & feats.valid

        bind_prev = jnp.where(keep1 & inl, bind1, -1)
        bind_win = jnp.where(from2 & inl, bind2, -1)
        close = feats.valid & (feats.depth > 0) & (feats.depth < th_depth_m)
        n_tc = jnp.sum(close & inl).astype(jnp.int32)
        n_ntc = jnp.sum(close & ~inl).astype(jnp.int32)
        packed = jnp.concatenate([
            jnp.stack([res2.n_inliers, res1.n_inliers, n_tc, n_ntc]
                      ).astype(jnp.float32),
            res2.Tcw.astype(jnp.float32),
            bind_prev.astype(jnp.float32),
            bind_win.astype(jnp.float32),
            ok2.astype(jnp.float32),
        ])
        return TrackStepOut(
            Tcw=res2.Tcw,
            n_inliers=res2.n_inliers,
            n_mm_inliers=res1.n_inliers,
            bind_prev=bind_prev,
            bind_win=bind_win,
            feats=feats,
            next_Xw=jnp.where(inl[:, None], Xw, 0.0),
            next_bound=inl,
            win_visible=ok2,
            n_tracked_close=n_tc,
            n_nontracked_close=n_ntc,
            packed=packed,
        )

    return fn
