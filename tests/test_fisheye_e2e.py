"""Fisheye-native SLAM end-to-end (round 4): a KannalaBrandt8 world
rendered through the KB8 projection drives the full engine — matching,
pose optimization, triangulation and local BA all run with KB8 residuals
(reference reprojection edges project through ``GeometricCamera``,
``OptimizableTypes.h:31-196`` / ``G2oTypes.h:74-817``), not a pinhole
approximation. Off-axis features (>30° where the pinhole model is badly
wrong for a fisheye) must survive BA as inliers."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import SlamConfig, OrbConfig, STEREO
from orb_slam3_rgbl_tpu.geometry import lie, align, camera as cam_mod
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera
from orb_slam3_rgbl_tpu.slam.frame import FrameFeatures
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

# TUM-VI-like fisheye; KB8 coefficients ride in the k1/k2/k3/p2 slots of
# the parsed calibration (SlamConfig.geo_camera mapping)
FX, FY, CX, CY = 190.978, 190.973, 254.932, 256.897
K0, K1, K2, K3 = 0.00348, 0.000715, -0.0020532, 0.000202
W, H = 512, 512
BASELINE = 0.101


def fisheye_config() -> SlamConfig:
    cam = PinholeCamera(
        fx=FX, fy=FY, cx=CX, cy=CY,
        k1=K0, k2=K1, k3=K2, p2=K3,
        width=W, height=H, bf=FX * BASELINE, th_depth=40.0)
    return SlamConfig(
        sensor=STEREO, camera=cam, camera_type="KannalaBrandt8",
        orb=OrbConfig(n_features=600), loop_closing=False, fps=10.0)


class FisheyeWorld:
    """Landmark cloud spread across the wide fisheye FOV; renders
    fixed-capacity FrameFeatures through the TRUE KB8 projection."""

    def __init__(self, rng, n=6000, length=12.0):
        self.rng = rng
        self.kb8 = fisheye_config().geo_camera
        # indoor corridor along +z with walls/ceiling well off-axis
        z = rng.uniform(0.0, length + 4.0, n)
        side = rng.uniform(-2.5, 2.5, (n, 2))
        self.points = np.stack([side[:, 0], side[:, 1], z], 1).astype(np.float32)
        self.desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)

    def render(self, Tcw, n_feat=600, px_noise=0.3, depth_frac=0.9):
        rng = self.rng
        pc = np.asarray(lie.se3_apply(jnp.asarray(Tcw), jnp.asarray(self.points)))
        z = pc[:, 2]
        vis = z > 0.25
        uv = cam_mod.np_geo_project(self.kb8, pc)
        vis &= ((uv[:, 0] >= 8) & (uv[:, 0] < W - 8)
                & (uv[:, 1] >= 8) & (uv[:, 1] < H - 8))
        ids = np.nonzero(vis)[0][:n_feat]
        m = len(ids)
        out_uv = np.zeros((n_feat, 2), np.float32)
        desc = np.zeros((n_feat, 8), np.uint32)
        depth = np.full(n_feat, -1.0, np.float32)
        ur = np.full(n_feat, -1.0, np.float32)  # fisheye: depth-only
        valid = np.zeros(n_feat, bool)
        out_uv[:m] = uv[ids] + rng.normal(0, px_noise, (m, 2))
        desc[:m] = self.desc[ids]
        has_d = rng.uniform(size=m) < depth_frac
        depth[:m][has_d] = z[ids][has_d] * (1 + rng.normal(0, 0.01, has_d.sum()))
        valid[:m] = True
        self.last_ids = ids
        return FrameFeatures(
            uv=jnp.asarray(out_uv),
            response=jnp.zeros(n_feat, jnp.float32),
            octave=jnp.zeros(n_feat, jnp.int32),
            angle=jnp.zeros(n_feat, jnp.float32),
            desc=jnp.asarray(desc),
            valid=jnp.asarray(valid), depth=jnp.asarray(depth),
            u_right=jnp.asarray(ur),
        )


def drive(rng, n_frames=30, step=0.28):
    cfg = fisheye_config()
    world = FisheyeWorld(rng)
    gt = []
    for i in range(n_frames):
        # forward along +z with gentle yaw weave
        yaw = 0.06 * np.sin(i * 0.4)
        q = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0], np.float32)
        Twc = np.concatenate([q, [0.15 * np.sin(i * 0.3), 0.0, i * step]]).astype(np.float32)
        gt.append(np.asarray(lie.se3_inv(jnp.asarray(Twc)), np.float32))
    gt = np.stack(gt)
    sysm = System(cfg)
    results = [sysm.track_features(world.render(gt[i]), i * 0.1)
               for i in range(n_frames)]
    return sysm, gt, results, world


class TestFisheyeNative:
    def test_geo_camera_resolution(self):
        cfg = fisheye_config()
        cam = cfg.geo_camera
        assert cam_mod.is_fisheye(cam)
        assert cam.k0 == K0 and cam.k3 == K3

    def test_fisheye_odometry(self, rng):
        sysm, gt, results, world = drive(rng)
        assert sysm.tracker.geo_cam is not None
        assert cam_mod.is_fisheye(sysm.tracker.geo_cam)
        states = [r.state for r in results]
        assert all(s == trk.OK for s in states), \
            [trk.STATE_NAMES[s] for s in states]
        est = sysm.trajectory()
        gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        err = float(align.ate_rmse(jnp.asarray(gt_twc[:, 4:7]),
                                   jnp.asarray(est[:, 4:7])))
        # ~8 m drive, KB8-native residuals: sub-decimeter
        assert err < 0.1, err
        assert sysm.map.n_kf >= 2

    def test_off_axis_landmarks_survive_ba(self, rng):
        """Landmarks >30° off-axis (where pinhole reprojection of a KB8
        observation is tens of pixels wrong) must persist as BA inliers —
        the round-3 pinhole-residual deviation culled or distorted them."""
        sysm, gt, results, world = drive(rng)
        m = sysm.map
        lms = np.nonzero(m.lm_valid)[0]
        assert lms.size > 200
        # angle off the optical axis of the LAST keyframe
        kf = int(m.valid_kf_ids()[-1])
        pc = np.asarray(lie.se3_apply(jnp.asarray(m.kf_pose[kf]),
                                      jnp.asarray(m.lm_pos[lms])))
        r = np.linalg.norm(pc[:, :2], axis=1)
        theta = np.degrees(np.arctan2(r, pc[:, 2]))
        seen = m.kf_lm_idx[kf]
        seen = set(seen[seen >= 0].tolist())
        off_axis = [lm for lm, t in zip(lms, theta) if t > 30 and int(lm) in seen]
        assert len(off_axis) > 20, \
            f"only {len(off_axis)} off-axis landmarks bound in the last KF"
        # their reprojection error under the TRUE model stays small
        sel = np.asarray(off_axis)
        row = m.kf_lm_idx[kf]
        slot_of = {int(l): i for i, l in enumerate(row) if l >= 0}
        feat = np.asarray([slot_of[int(l)] for l in sel])
        pc_sel = np.asarray(lie.se3_apply(jnp.asarray(m.kf_pose[kf]),
                                          jnp.asarray(m.lm_pos[sel])))
        proj = cam_mod.np_geo_project(sysm.tracker.geo_cam, pc_sel)
        errs = np.linalg.norm(proj - m.kf_uv[kf, feat], axis=1)
        assert np.median(errs) < 2.0, np.median(errs)
