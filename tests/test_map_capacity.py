"""Landmark slot recycling + growth (VERDICT r2: slots leaked forever and
``add_landmarks`` raised at capacity — a KITTI-00-scale run would die)."""

import numpy as np
import pytest

from orb_slam3_rgbl_tpu.slam.map_state import MapState


def _mk(max_lm=256, n_feat=32, max_kf=64):
    return MapState.create(max_kf=max_kf, max_lm=max_lm, n_feat=n_feat)


def _add(m, kf, n, rng):
    pos = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    feat = np.arange(n)
    normal = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
    d = np.ones(n, np.float32)
    return m.add_landmarks(pos, desc, kf, feat, normal, d * 2, d / 2)


class TestCapacityChurn:
    def test_create_cull_recycle_beyond_capacity(self, rng):
        m = _mk(max_lm=256)
        for k in range(8):
            m.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                           np.zeros((32, 2), np.float32), np.zeros(32, np.int16),
                           np.zeros((32, 8), np.uint32), np.full(32, -1.0, np.float32),
                           np.full(32, -1.0, np.float32), np.ones(32, bool),
                           np.full(32, -1, np.int32), 0.0, k)
        total_created = 0
        for round_ in range(40):
            kf = round_ % 8
            ids = _add(m, kf, 24, rng)
            total_created += len(ids)
            # cull most of them
            m.remove_landmarks(ids[: 20])
        # far more landmarks than capacity ever existed…
        assert total_created == 40 * 24
        assert total_created > 256
        # …but the arrays only grew as needed for the LIVE set
        assert int(m.lm_valid.sum()) == 40 * 4
        assert m.capacity_lm <= 512

    def test_generation_guard_detects_recycled_slot(self, rng):
        m = _mk()
        ids = _add(m, 0, 8, rng)
        m.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                       np.zeros((32, 2), np.float32), np.zeros(32, np.int16),
                       np.zeros((32, 8), np.uint32), np.full(32, -1.0, np.float32),
                       np.full(32, -1.0, np.float32), np.ones(32, bool),
                       np.full(32, -1, np.int32), 0.0, 0)
        gen_before = m.lm_gen[ids].copy()
        m.remove_landmarks(ids)
        ids2 = _add(m, 0, 8, rng)
        # slots recycled LIFO with bumped generations
        assert set(ids2.tolist()) == set(ids.tolist())
        assert (m.lm_gen[ids2] == gen_before + 1).all()

    def test_growth_preserves_contents(self, rng):
        m = _mk(max_lm=64, n_feat=64)
        ids1 = _add(m, 0, 60, rng)
        pos1 = m.lm_pos[ids1].copy()
        ids2 = _add(m, 1, 60, rng)   # forces a doubling
        assert m.capacity_lm >= 120
        np.testing.assert_array_equal(m.lm_pos[ids1], pos1)
        assert m.lm_valid[ids2].all()

    def test_remove_is_idempotent_and_unbinds(self, rng):
        m = _mk()
        ids = _add(m, 0, 10, rng)
        m.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                       np.zeros((32, 2), np.float32), np.zeros(32, np.int16),
                       np.zeros((32, 8), np.uint32), np.full(32, -1.0, np.float32),
                       np.full(32, -1.0, np.float32), np.ones(32, bool),
                       np.full(32, -1, np.int32), 0.0, 0)
        m.kf_lm_idx[0, :10] = ids
        m.remove_landmarks(ids[:5])
        m.remove_landmarks(ids[:5])  # second call must not double-free
        assert (m.kf_lm_idx[0, :5] == -1).all()
        assert (m.kf_lm_idx[0, 5:10] == ids[5:]).all()
        assert len(m.lm_free) == 5


class TestDebugCheckers:
    def test_consistency_and_reprojection_probes(self, rng):
        """Map debug utilities (reference Map::printReprojectionError /
        CheckEssentialGraph analogs) on a consistent little map."""
        from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
        from orb_slam3_rgbl_tpu.slam import map_state as ms

        cam = kitti_rgbl_config().camera
        m = _mk(max_lm=128, n_feat=64)
        X = np.stack([rng.uniform(-10, 10, 30), rng.uniform(-3, 3, 30),
                      rng.uniform(10, 40, 30)], 1).astype(np.float32)
        z = X[:, 2]
        uv = np.stack([cam.fx * X[:, 0] / z + cam.cx,
                       cam.fy * X[:, 1] / z + cam.cy], 1).astype(np.float32)
        feat_uv = np.zeros((64, 2), np.float32)
        feat_uv[:30] = uv
        m.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), feat_uv,
                       np.zeros(64, np.int16), np.zeros((64, 8), np.uint32),
                       np.full(64, -1.0, np.float32), np.full(64, -1.0, np.float32),
                       np.ones(64, bool), np.full(64, -1, np.int32), 0.0, 0)
        d = np.ones(30, np.float32)
        m.add_landmarks(X, np.zeros((30, 8), np.uint32), 0, np.arange(30),
                        np.tile(np.array([0, 0, 1], np.float32), (30, 1)),
                        d * 50, d)
        assert ms.check_binding_consistency(m) == []
        stats = ms.debug_reprojection_error(m, cam)
        assert stats["n"] == 30 and stats["mean_px"] < 1e-3
        # corrupt a binding → the checker flags it
        m.lm_valid[m.kf_lm_idx[0, 0]] = False
        assert any("invalid landmarks" in s for s in ms.check_binding_consistency(m))
