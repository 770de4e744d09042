"""Atlas map-merge (MergeLocal) tests: Sim3 weld math + end-to-end
blackout → new map → revisit → weld recovery."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie, align
from orb_slam3_rgbl_tpu.slam import merging
from orb_slam3_rgbl_tpu.slam import tracking as trk
from orb_slam3_rgbl_tpu.slam.map_state import MapState
from orb_slam3_rgbl_tpu.slam.system import System

from synthetic_world import SyntheticWorld


def _rand_se3(rng):
    w = rng.normal(0, 0.4, 3)
    t = rng.normal(0, 2.0, 3)
    return np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]).astype(np.float64))))


class TestWeldMath:
    def test_world_alignment_recovers_transform(self, rng):
        """S12 computed from ground-truth geometry must invert back to the
        exact world alignment."""
        S_w2_w1 = np.concatenate([_rand_se3(rng), [1.0]]).astype(np.float64)
        T_c1_w1 = _rand_se3(rng)
        T_c2_w2 = _rand_se3(rng)
        # ground-truth loop constraint: S12 = S_c1_w2 ∘ S_c2_w2⁻¹ where
        # S_c1_w2 = T_c1_w1 ∘ S_w1_w2
        S_c1_w2 = lie.sim3_mul(lie.sim3_from_se3(jnp.asarray(T_c1_w1)),
                               lie.sim3_inv(jnp.asarray(S_w2_w1)))
        S12 = np.asarray(lie.sim3_mul(S_c1_w2, lie.sim3_inv(lie.sim3_from_se3(jnp.asarray(T_c2_w2)))))
        out = merging.world_alignment(S12, T_c1_w1.astype(np.float32),
                                      T_c2_w2.astype(np.float32))
        got = np.asarray(lie.sim3_apply(jnp.asarray(out, jnp.float64),
                                        jnp.asarray(np.eye(3))))
        want = np.asarray(lie.sim3_apply(jnp.asarray(S_w2_w1), jnp.asarray(np.eye(3))))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_merge_transports_geometry_exactly(self, rng):
        """SE3 weld (fix-scale sensors): transported poses and landmarks
        land exactly on their archived-world ground truth."""
        N = 16
        # ground truth in the archived world w2
        T_w2 = np.stack([_rand_se3(rng) for _ in range(2)]).astype(np.float32)
        X_w2 = rng.normal(0, 5.0, (10, 3)).astype(np.float32)
        S_w2_w1 = np.concatenate([_rand_se3(rng), [1.0]]).astype(np.float32)

        # the same content expressed in the active world w1
        T_w1 = np.asarray(lie.se3_mul(jnp.asarray(T_w2), jnp.asarray(S_w2_w1[None, :7])), np.float32)
        X_w1 = np.asarray(lie.sim3_apply(lie.sim3_inv(jnp.asarray(S_w2_w1)), jnp.asarray(X_w2)))

        old = MapState.create(8, 64, N)
        old.add_keyframe(np.asarray(lie.se3_identity()), np.zeros((N, 2), np.float32),
                         np.zeros(N, np.int16), np.zeros((N, 8), np.uint32),
                         np.full(N, -1.0, np.float32), np.full(N, -1.0, np.float32),
                         np.zeros(N, bool), np.full(N, -1, np.int32), 0.0, 0)
        active = MapState.create(8, 64, N, map_id=1)
        for i, T in enumerate(T_w1):
            lm_idx = np.full(N, -1, np.int32)
            active.add_keyframe(T, np.zeros((N, 2), np.float32),
                                np.zeros(N, np.int16), np.zeros((N, 8), np.uint32),
                                np.full(N, -1.0, np.float32), np.full(N, -1.0, np.float32),
                                np.zeros(N, bool), lm_idx, float(i), i)
        ids = active.add_landmarks(
            X_w1.astype(np.float32), np.zeros((10, 8), np.uint32), 0,
            np.arange(10), np.tile([0, 0, 1.0], (10, 1)).astype(np.float32),
            np.ones(10, np.float32), np.ones(10, np.float32) * 0.1,
        )
        res = merging.merge_maps(old, active, ev_kf_cur=0, S_w2_w1=S_w2_w1)
        m = res.map
        assert m.n_kf == 3 and m.n_lm == 10
        got_T = m.kf_pose[res.kf_remap[[0, 1]]]
        for a, b in zip(got_T, T_w2):
            # compare as transforms (quaternion sign ambiguity)
            d = np.asarray(lie.se3_mul(jnp.asarray(a), lie.se3_inv(jnp.asarray(b))))
            np.testing.assert_allclose(d[4:7], 0, atol=1e-3)
            assert abs(abs(d[0]) - 1) < 1e-4
        np.testing.assert_allclose(m.lm_pos[res.lm_remap[ids]], X_w2, atol=1e-3)
        # bindings remapped
        assert (m.kf_lm_idx[res.kf_remap[0], :10] == res.lm_remap[ids]).all()

    def test_fusion_replaces_duplicates(self):
        N = 4
        m = MapState.create(4, 16, N)
        m.add_keyframe(np.asarray(lie.se3_identity()), np.zeros((N, 2), np.float32),
                       np.zeros(N, np.int16), np.zeros((N, 8), np.uint32),
                       np.full(N, -1.0, np.float32), np.full(N, -1.0, np.float32),
                       np.ones(N, bool), np.full(N, -1, np.int32), 0.0, 0)
        ids = m.add_landmarks(np.zeros((4, 3), np.float32), np.zeros((4, 8), np.uint32),
                              0, np.arange(4), np.tile([0, 0, 1.0], (4, 1)).astype(np.float32),
                              np.ones(4, np.float32), np.ones(4, np.float32))
        remap = merging.apply_fusion(m, np.array([2, 3]), np.array([0, 1]))
        assert (m.kf_lm_idx[0, :4] == [0, 1, 0, 1]).all()
        assert not m.lm_valid[2] and not m.lm_valid[3]
        assert remap[2] == 0 and remap[3] == 1


class TestMergeEndToEnd:
    def test_blackout_creates_and_welds_maps(self, rng):
        """Long blackout forces a fresh Atlas map; once the new map sees
        already-mapped territory the two maps weld and the full trajectory
        resolves in one frame (reference elastic recovery:
        CreateMapInAtlas + MergeLocal)."""
        cfg = kitti_rgbl_config()
        world = SyntheticWorld(rng, cam=cfg.camera, length=45.0)
        n_frames = 90
        gt = []
        T = None
        # phase 1: forward 0..34; blackout 35..54 (stationary); resume 55+
        full = world.trajectory(n_frames, step=0.5)
        for i in range(n_frames):
            if 35 <= i < 55:
                gt.append(gt[34])
            elif i >= 55:
                gt.append(full[i - 20])
            else:
                gt.append(full[i])
        gt = np.stack(gt)

        sys = System(cfg)
        states = []
        for i in range(n_frames):
            feats = world.render(gt[i])
            if 35 <= i < 55:
                feats = feats._replace(valid=jnp.zeros_like(feats.valid))
            r = sys.track_features(feats, i * 0.1)
            states.append(r.state)

        # a second map was spawned during the blackout...
        assert any(s in (trk.LOST, trk.RECENTLY_LOST) for s in states[35:55])
        # ...and welded back: a single atlas entry remains
        assert sys.atlas.n_maps() == 1, [e.map.map_id for e in sys.atlas.entries]

        est = sys.trajectory()
        lost = np.asarray(sys.tracker.traj_lost)
        ok = ~lost
        gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        err = float(align.ate_rmse(jnp.asarray(gt_twc[ok, 4:7]),
                                   jnp.asarray(est[ok, 4:7])))
        assert err < 0.5, err
