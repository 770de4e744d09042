"""End-to-end SLAM engine tests on synthetic worlds (feature-level).

Covers BASELINE.json config-1 semantics: depth-aided odometry with
tracking + local mapping + local BA; ATE vs ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie, align
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

from synthetic_world import SyntheticWorld


def run_sequence(rng, n_frames=60, step=0.8, yaw_rate=0.0, **render_kw):
    cfg = kitti_rgbl_config()
    world = SyntheticWorld(rng, cam=cfg.camera, length=n_frames * step)
    gt = world.trajectory(n_frames, step=step, yaw_rate=yaw_rate)
    sys = System(cfg)
    results = []
    for i in range(n_frames):
        feats = world.render(gt[i], **render_kw)
        results.append(sys.track_features(feats, timestamp=i * 0.1))
    return sys, gt, results


def ate(sys, gt):
    est = sys.trajectory()  # (F, 7) Twc
    gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
    return float(align.ate_rmse(jnp.asarray(gt_twc[:, 4:7]), jnp.asarray(est[:, 4:7])))


class TestEndToEnd:
    def test_straight_odometry(self, rng):
        sys, gt, results = run_sequence(rng, n_frames=50)
        states = [r.state for r in results]
        assert states[0] == trk.OK  # initialized on first frame
        assert all(s == trk.OK for s in states[1:]), [trk.STATE_NAMES[s] for s in states]
        err = ate(sys, gt)
        # 40 m trajectory; sub-decimeter expected with depth + BA
        assert err < 0.15, err

    def test_curved_trajectory(self, rng):
        sys, gt, results = run_sequence(rng, n_frames=60, yaw_rate=0.01)
        assert all(r.state == trk.OK for r in results)
        err = ate(sys, gt)
        assert err < 0.2, err

    def test_keyframes_inserted_and_ba_ran(self, rng):
        sys, gt, results = run_sequence(rng, n_frames=50)
        assert sys.map.n_kf >= 3, sys.map.n_kf
        assert sys.map.n_lm > 500
        # map versions advance (BA writebacks happened)
        assert sys.map.version > sys.map.n_kf

    def test_tracking_survives_feature_dropout(self, rng):
        sys, gt, results = run_sequence(rng, n_frames=40, dropout=0.35, n_feat=700)
        ok_frames = sum(r.state == trk.OK for r in results)
        assert ok_frames > 35

    def test_mostly_mono_observations(self, rng):
        # only 30% of features carry depth — exercises mono residuals
        sys, gt, results = run_sequence(rng, n_frames=40, depth_frac=0.3)
        assert all(r.state == trk.OK for r in results)
        assert ate(sys, gt) < 0.5

    def test_trajectory_formats(self, rng, tmp_path):
        sys, gt, results = run_sequence(rng, n_frames=20)
        kitti = tmp_path / "kitti.txt"
        tum = tmp_path / "tum.txt"
        euroc = tmp_path / "euroc.txt"
        sys.save_trajectory_kitti(str(kitti))
        sys.save_trajectory_tum(str(tum))
        sys.save_trajectory_euroc(str(euroc))
        rows = np.loadtxt(kitti)
        assert rows.shape == (20, 12)
        tum_rows = np.loadtxt(tum)
        assert tum_rows.shape == (20, 8)
        # EuRoC format is space-separated ts_ns tx ty tz qx qy qz qw
        # (reference System.cc:904-911)
        assert np.loadtxt(euroc).shape == (20, 8)
        # first pose ≈ identity
        np.testing.assert_allclose(rows[0].reshape(3, 4)[:, :3], np.eye(3), atol=1e-5)

    def test_keyframe_trajectory_formats(self, rng, tmp_path):
        sys, gt, results = run_sequence(rng, n_frames=30)
        n_kf = sys.map.n_kf
        for name, loader in [
            ("kf_kitti.txt", lambda p: np.loadtxt(p)),
            ("kf_tum.txt", lambda p: np.loadtxt(p)),
            ("kf_euroc.txt", lambda p: np.loadtxt(p)),
        ]:
            path = tmp_path / name
            getattr(sys, "save_keyframe_trajectory_" + name.split("_")[1].split(".")[0])(str(path))
            rows = loader(str(path))
            assert rows.reshape(n_kf, -1).shape[0] == n_kf


class TestSystemLifecycle:
    def test_localization_mode_freezes_map(self, rng):
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=40.0)
        gt = world.trajectory(40, step=0.8)
        sys = System(cfg)
        for i in range(20):
            sys.track_features(world.render(gt[i]), timestamp=i * 0.1)
        n_kf, n_lm = sys.map.n_kf, sys.map.n_lm
        sys.activate_localization_mode()
        res = None
        for i in range(20, 40):
            res = sys.track_features(world.render(gt[i]), timestamp=i * 0.1)
        assert sys.map.n_kf == n_kf and sys.map.n_lm == n_lm
        assert res.state == trk.OK
        sys.deactivate_localization_mode()
        for i in range(30, 40):
            sys.track_features(world.render(gt[i]), timestamp=(i + 10) * 0.1)
        assert not sys.tracker.only_tracking

    def test_atlas_save_load_roundtrip_and_resume(self, rng, tmp_path):
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=40.0)
        gt = world.trajectory(40, step=0.8)
        sys = System(cfg)
        for i in range(25):
            sys.track_features(world.render(gt[i]), timestamp=i * 0.1)
        path = str(tmp_path / "atlas.npz")
        sys.save_atlas(path)
        n_kf, n_lm = sys.map.n_kf, sys.map.n_lm
        n_traj = len(sys.tracker.traj_time)

        sys2 = System(cfg)
        sys2.load_atlas(path)
        assert sys2.map.n_kf == n_kf and sys2.map.n_lm == n_lm
        assert len(sys2.tracker.traj_rel) == n_traj
        # resume: relocalize against the restored map and keep tracking
        ok = 0
        for i in range(25, 40):
            r = sys2.track_features(world.render(gt[i]), timestamp=i * 0.1)
            ok += int(r.state == trk.OK)
        assert ok >= 10, ok
        assert len(sys2.trajectory()) == n_traj + 15

    def test_reset_and_reset_active_map(self, rng):
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=30.0)
        gt = world.trajectory(24, step=0.8)
        sys = System(cfg)
        for i in range(12):
            sys.track_features(world.render(gt[i]), timestamp=i * 0.1)
        old_map_id = sys.map.map_id
        sys.reset_active_map()
        assert sys.map.map_id != old_map_id and sys.map.n_kf == 0
        # keeps tracking in the fresh map
        r = sys.track_features(world.render(gt[12]), timestamp=1.2)
        assert sys.map.n_kf >= 1
        sys.reset()
        assert sys.atlas is None
        r = sys.track_features(world.render(gt[13]), timestamp=1.3)
        assert r.state == trk.OK and sys.map.n_kf >= 1


class TestLocalizationMode:
    def test_frozen_map_localization_with_vo_points(self, rng):
        """Reference ActivateLocalizationMode semantics: map frozen (no
        keyframes, no landmark growth), tracking continues against it —
        and through briefly-unmapped territory on temporal VO points
        (UpdateLastFrame, Tracking.cc:2815-2886)."""
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=40 * 0.8)
        gt = world.trajectory(40, step=0.8)
        sys = System(cfg)
        results = [sys.track_features(world.render(gt[i]), i * 0.1)
                   for i in range(40)]
        assert all(r.state == trk.OK for r in results)
        n_kf_before = sys.map.n_kf
        n_lm_before = int(sys.map.lm_valid.sum())
        sys.activate_localization_mode()

        # drive back through the mapped corridor (reverse of the last 25
        # poses) against the FROZEN map
        states = []
        t = 4.0
        for T in gt[::-1][:25]:
            r = sys.track_features(world.render(T), t)
            states.append(r.state)
            t += 0.1
        ok_frac = np.mean([s == trk.OK for s in states])
        assert ok_frac > 0.9, states
        # the frozen map did not grow
        assert sys.map.n_kf == n_kf_before
        assert int(sys.map.lm_valid.sum()) <= n_lm_before


class TestDescriptorRealism:
    def test_tracking_under_bit_noise_and_outliers(self, rng):
        """Matching/tracking must survive non-exact association: 16 of 256
        descriptor bits flipped per frame + 8% spurious features (VERDICT
        r2: noise-free descriptors validated association trivially)."""
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=40 * 0.8)
        gt = world.trajectory(40, step=0.8)
        sys = System(cfg)
        states = []
        for i in range(40):
            feats = world.render(gt[i], desc_noise_bits=16, outlier_frac=0.08)
            states.append(sys.track_features(feats, i * 0.1).state)
        ok = np.mean([s == trk.OK for s in states])
        assert ok > 0.95, states
        assert ate(sys, gt) < 0.25
