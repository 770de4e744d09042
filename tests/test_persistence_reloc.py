"""Checkpoint save/load + relocalization tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk
from orb_slam3_rgbl_tpu.utils import serialization

from synthetic_world import SyntheticWorld


class TestSerialization:
    def test_roundtrip(self, rng, tmp_path):
        from test_slam_e2e import run_sequence

        sys, gt, results = run_sequence(rng, n_frames=25)
        path = str(tmp_path / "atlas.npz")
        serialization.save_map(path, sys.map)
        m2 = serialization.load_map(path)
        assert m2.n_kf == sys.map.n_kf
        assert m2.n_lm == sys.map.n_lm
        np.testing.assert_array_equal(m2.kf_pose, sys.map.kf_pose)
        np.testing.assert_array_equal(m2.lm_pos, sys.map.lm_pos)
        np.testing.assert_array_equal(m2.kf_lm_idx, sys.map.kf_lm_idx)

    def test_vocab_guard(self, rng, tmp_path, monkeypatch):
        from test_slam_e2e import run_sequence

        sys, *_ = run_sequence(rng, n_frames=25)
        path = str(tmp_path / "atlas.npz")
        serialization.save_map(path, sys.map)
        import orb_slam3_rgbl_tpu.utils.serialization as ser
        monkeypatch.setattr(ser, "vocabulary_checksum", lambda: "deadbeef")
        with pytest.raises(ValueError, match="vocab"):
            ser.load_map(path)


class TestRelocalization:
    def test_recovers_after_blackout(self, rng):
        """Blind the sensor for several frames mid-sequence; tracking must
        drop to RECENTLY_LOST/LOST and then relocalize when features
        return (reference failure-recovery behaviour, SURVEY §5)."""
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=60.0)
        gt = world.trajectory(60, step=0.5)
        sys = System(cfg)

        states = []
        for i in range(60):
            if 30 <= i < 36:
                # blackout: valid mask all false
                feats = world.render(gt[i])
                feats = feats._replace(valid=jnp.zeros_like(feats.valid))
            else:
                feats = world.render(gt[i])
            r = sys.track_features(feats, i * 0.1)
            states.append(r.state)

        assert states[29] == trk.OK
        assert states[31] != trk.OK  # lost during blackout
        # relocalized soon after the blackout ends (same place revisited)
        assert trk.OK in states[36:42], [trk.STATE_NAMES[s] for s in states[30:]]
        # final pose (after recovery + continued tracking) is consistent
        # with ground truth — relocalization put us back on the true map
        est_final = sys.tracker.cur_pose
        err = np.asarray(
            lie.se3_log(lie.se3_mul(jnp.asarray(est_final), lie.se3_inv(jnp.asarray(gt[59]))))
        )
        assert np.linalg.norm(err) < 0.5, err
