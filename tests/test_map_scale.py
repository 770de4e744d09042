"""Map data structures at KITTI-00 scale (~1.5k keyframes, ~200k landmark
slots with churn): insertion, recycling, covisibility and observation
scans must stay tractable — this is the 'long-context' analog of the
reference (SURVEY §5: unbounded map growth tamed by locality structures)."""

import time

import numpy as np
import pytest

from orb_slam3_rgbl_tpu.slam.map_state import MapState


@pytest.fixture(scope="module")
def big_map():
    rng = np.random.default_rng(0)
    N = 256            # features per KF (scaled down ~8× from 2000…)
    K = 1536           # …but the full KITTI-00 keyframe count
    m = MapState.create(max_kf=2048, max_lm=32768, n_feat=N)
    lm_window = []     # sliding landmark window for overlap
    for k in range(K):
        uv = rng.uniform(0, 1000, (N, 2)).astype(np.float32)
        desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
        pose = np.array([1, 0, 0, 0, 0, 0, -0.8 * k], np.float32)
        lm_idx = np.full(N, -1, np.int32)
        # bind ~60% of features to recent landmarks (covisibility overlap)
        if lm_window:
            pool = np.concatenate(lm_window[-6:])
            take = min(int(0.6 * N), pool.size)
            lm_idx[:take] = rng.choice(pool, take, replace=False)
        kf = m.add_keyframe(pose, uv, np.zeros(N, np.int16), desc,
                            np.full(N, 12.0, np.float32),
                            np.full(N, -1.0, np.float32),
                            np.ones(N, bool), lm_idx, 0.1 * k, k)
        # ~80 new landmarks per KF + cull ~40 old ones (churn)
        free = np.nonzero(lm_idx < 0)[0][:80]
        pos = rng.uniform(-20, 20, (len(free), 3)).astype(np.float32)
        d = np.ones(len(free), np.float32)
        ids = m.add_landmarks(pos, desc[free], kf, free,
                              np.tile(np.array([0, 0, 1], np.float32),
                                      (len(free), 1)), d * 30, d)
        lm_window.append(ids)
        if len(lm_window) > 10:
            old = lm_window.pop(0)
            m.remove_landmarks(old[: len(old) // 2])
    return m


class TestKitti00Scale:
    def test_scale_reached_with_bounded_arrays(self, big_map):
        m = big_map
        assert m.n_kf == 1536
        total_created = 1536 * 80
        assert total_created > 100_000
        # churn recycled slots: capacity stayed near the live set size
        assert m.capacity_lm <= 131072
        assert int(m.lm_valid.sum()) < m.capacity_lm

    def test_covisibility_scan_stays_fast(self, big_map):
        m = big_map
        t0 = time.perf_counter()
        w = m.covisibility_weights(int(m.n_kf - 1))
        dt = time.perf_counter() - t0
        assert (w > 0).sum() > 0
        # O(n_kf·N) numpy scan: must be well under a frame budget
        assert dt < 0.25, dt

    def test_observation_counts_and_window_gather(self, big_map):
        m = big_map
        t0 = time.perf_counter()
        counts = m.observation_counts()
        dt = time.perf_counter() - t0
        assert counts.max() >= 2
        assert dt < 0.5, dt
        # BA-window gather at the end of the run
        kfs = m.valid_kf_ids()[-24:]
        tbl = m.kf_lm_idx[kfs]
        lm_ids = np.unique(tbl[tbl >= 0])[:4096]
        t0 = time.perf_counter()
        m.gather_observations(kfs, lm_ids, 8)
        assert time.perf_counter() - t0 < 1.0

    def test_full_covisibility_matrix_tractable(self, big_map):
        m = big_map
        t0 = time.perf_counter()
        valid, W = m.covisibility_matrix()
        dt = time.perf_counter() - t0
        assert W.shape == (m.n_kf, m.n_kf)
        assert dt < 20.0, dt
