"""SearchInNeighbors / Fuse duplicate-landmark fusion
(reference ``LocalMapping.cc:714-824`` + ``ORBmatcher::Fuse``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.slam.local_mapping import LocalMapper
from orb_slam3_rgbl_tpu.slam.map_state import MapState


def _project(cam, Tcw, X):
    pc = np.asarray(lie.se3_apply(jnp.asarray(Tcw), jnp.asarray(X)))
    return np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                     cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], 1).astype(np.float32), pc[:, 2]


@pytest.fixture
def dup_map(rng):
    """Two keyframes seeing the SAME 60 world points, each with its own
    duplicate landmark set (the situation after triangulation without
    fusion)."""
    cfg = kitti_rgbl_config()
    cam = cfg.camera
    N = 200
    m = MapState.create(max_kf=8, max_lm=1024, n_feat=N)
    X = np.stack([rng.uniform(-15, 15, 60), rng.uniform(-4, 4, 60),
                  rng.uniform(12, 45, 60)], 1).astype(np.float32)
    desc = rng.integers(0, 2**32, (60, 8), dtype=np.uint32)
    T0 = np.asarray(lie.se3_identity(), np.float32)
    tau = np.array([0.4, 0, -1.0, 0, 0.01, 0], np.float32)
    T1 = np.asarray(lie.se3_exp(jnp.asarray(tau)), np.float32)

    kf_ids = []
    for Tcw in (T0, T1):
        uv, z = _project(cam, Tcw, X)
        feat_uv = np.zeros((N, 2), np.float32)
        feat_uv[:60] = uv
        fdesc = np.zeros((N, 8), np.uint32)
        fdesc[:60] = desc
        valid = np.zeros(N, bool)
        valid[:60] = True
        depth = np.full(N, -1.0, np.float32)
        depth[:60] = z
        k = m.add_keyframe(Tcw, feat_uv, np.zeros(N, np.int16), fdesc, depth,
                           np.full(N, -1.0, np.float32), valid,
                           np.full(N, -1, np.int32), 0.0, len(kf_ids))
        # each KF creates its OWN landmarks for all 60 features (duplicates)
        center = np.asarray(lie.se3_trans(lie.se3_inv(jnp.asarray(Tcw))))
        d = np.linalg.norm(X - center, axis=1)
        m.add_landmarks(X, desc, k, np.arange(60),
                        (X - center) / d[:, None], (d * 1.2).astype(np.float32),
                        (d / 3).astype(np.float32))
        kf_ids.append(k)
    return cfg, m, kf_ids


class TestFuse:
    def test_duplicates_merge_and_observations_grow(self, dup_map, rng):
        cfg, m, (k0, k1) = dup_map
        assert int(m.lm_valid.sum()) == 120
        w_before = m.covisibility_weights(k1)[k0]
        assert w_before == 0  # duplicate sets share no ids
        mapper = LocalMapper(cfg, m)
        mapper._search_in_neighbors(k1)
        # duplicates merged: ~60 landmarks survive
        assert int(m.lm_valid.sum()) <= 65, int(m.lm_valid.sum())
        # covisibility now sees the shared structure
        w_after = m.covisibility_weights(k1)[k0]
        assert w_after >= 50, w_after
        counts = m.observation_counts()
        live = np.nonzero(m.lm_valid)[0]
        assert (counts[live] >= 2).mean() > 0.8
        # freed slots recycled on the free list with bumped generations
        assert len(m.lm_free) >= 50

    def test_no_self_fuse_on_disjoint_maps(self, rng):
        """KFs seeing disjoint structure must not fuse anything."""
        cfg = kitti_rgbl_config()
        cam = cfg.camera
        N = 100
        m = MapState.create(max_kf=4, max_lm=512, n_feat=N)
        for j in range(2):
            X = np.stack([rng.uniform(-15, 15, 40), rng.uniform(-4, 4, 40),
                          rng.uniform(12, 45, 40)], 1).astype(np.float32)
            desc = rng.integers(0, 2**32, (40, 8), dtype=np.uint32)
            T = np.asarray(lie.se3_identity(), np.float32)
            uv, z = _project(cam, T, X)
            feat_uv = np.zeros((N, 2), np.float32)
            feat_uv[:40] = uv
            fdesc = np.zeros((N, 8), np.uint32)
            fdesc[:40] = desc
            valid = np.zeros(N, bool)
            valid[:40] = True
            k = m.add_keyframe(T, feat_uv, np.zeros(N, np.int16), fdesc,
                               np.full(N, -1.0, np.float32),
                               np.full(N, -1.0, np.float32), valid,
                               np.full(N, -1, np.int32), 0.0, j)
            center = np.zeros(3, np.float32)
            d = np.linalg.norm(X, axis=1)
            m.add_landmarks(X, desc, k, np.arange(40), X / d[:, None],
                            (d * 1.2).astype(np.float32), (d / 3).astype(np.float32))
        before = int(m.lm_valid.sum())
        mapper = LocalMapper(cfg, m)
        mapper._search_in_neighbors(1)
        # random 256-bit descriptors are ~128 bits apart — far over TH_LOW;
        # nothing merges
        assert int(m.lm_valid.sum()) == before
