"""Loop-closing component tests: retrieval, Sim3 RANSAC/refine, pose graph."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.retrieval import vocab
from orb_slam3_rgbl_tpu.optim import sim3 as sim3_opt
from orb_slam3_rgbl_tpu.optim import pose_graph
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config

CAM = kitti_rgbl_config().camera


def noisy_copy(rng, desc, n_flip):
    """Flip n_flip random bits of each packed descriptor."""
    out = desc.copy()
    for i in range(out.shape[0]):
        for b in rng.choice(256, n_flip, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


class TestVocab:
    def test_same_descriptors_score_high(self, rng):
        desc = rng.integers(0, 2**32, (300, 8), dtype=np.uint32)
        valid = np.ones(300, bool)
        v1 = vocab.bow_vector(jnp.asarray(desc), jnp.asarray(valid))
        v2 = vocab.bow_vector(jnp.asarray(noisy_copy(rng, desc, 8)), jnp.asarray(valid))
        unrelated = rng.integers(0, 2**32, (300, 8), dtype=np.uint32)
        v3 = vocab.bow_vector(jnp.asarray(unrelated), jnp.asarray(valid))
        s_same = float(vocab.l1_score(v1, v2)[0])
        s_diff = float(vocab.l1_score(v1, v3)[0])
        assert s_same > 2 * s_diff + 0.1, (s_same, s_diff)

    def test_word_determinism(self, rng):
        desc = jnp.asarray(rng.integers(0, 2**32, (10, 8), dtype=np.uint32))
        w1 = np.asarray(vocab.descriptor_words(desc))
        w2 = np.asarray(vocab.descriptor_words(desc))
        np.testing.assert_array_equal(w1, w2)
        assert w1.max() < vocab.VOCAB_SIZE


class TestSim3Ransac:
    def _make(self, rng, P=120, outlier_frac=0.2, fix_scale=True):
        p2 = np.stack(
            [rng.uniform(-10, 10, P), rng.uniform(-4, 4, P), rng.uniform(8, 50, P)], axis=1
        ).astype(np.float32)
        tau = np.array([0.4, -0.2, 0.3, 0.04, 0.02, -0.05, 0.0 if fix_scale else 0.1], np.float32)
        S12 = lie.sim3_exp(jnp.asarray(tau))
        p1 = np.array(lie.sim3_apply(S12, jnp.asarray(p2)))
        n_out = int(P * outlier_frac)
        out_idx = rng.choice(P, n_out, replace=False)
        p1[out_idx] += rng.uniform(2, 5, (n_out, 3))

        def proj(p):
            return np.stack(
                [CAM.fx * p[:, 0] / p[:, 2] + CAM.cx, CAM.fy * p[:, 1] / p[:, 2] + CAM.cy],
                axis=1,
            ).astype(np.float32)

        uv1 = proj(np.array(lie.sim3_apply(S12, jnp.asarray(p2))))  # true projections
        uv2 = proj(p2)
        return S12, p1.astype(np.float32), p2, uv1, uv2, out_idx

    def test_recovers_transform_with_outliers(self, rng):
        S_true, p1, p2, uv1, uv2, out_idx = self._make(rng)
        P = p1.shape[0]
        res = sim3_opt.sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(P), jnp.ones(P), jnp.ones(P, bool), CAM,
            jax.random.PRNGKey(0), n_hypotheses=256, fix_scale=True,
        )
        assert int(res.n_inliers) >= 0.7 * (P - len(out_idx))
        # refined estimate close to truth
        S = np.asarray(res.S12)
        d = np.asarray(lie.sim3_log(lie.sim3_mul(jnp.asarray(S), lie.sim3_inv(S_true))))
        assert np.linalg.norm(d) < 0.05, d

    def test_optimize_sim3_refines(self, rng):
        S_true, p1, p2, uv1, uv2, out_idx = self._make(rng, outlier_frac=0.1)
        P = p1.shape[0]
        # start from a perturbed estimate
        S0 = lie.sim3_mul(lie.sim3_exp(jnp.asarray([0.05, -0.05, 0.02, 0.01, -0.01, 0.005, 0.0])), S_true)
        S, inl, n = sim3_opt.optimize_sim3(
            S0, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(P), jnp.ones(P), jnp.ones(P, bool), CAM, fix_scale=True,
        )
        d = np.asarray(lie.sim3_log(lie.sim3_mul(S, lie.sim3_inv(S_true))))
        # 10% gross outliers stay in `valid`; Huber bounds but does not
        # eliminate their pull — tolerance reflects that
        assert np.linalg.norm(d) < 0.02, d
        assert int(n) >= 0.8 * (P - len(out_idx))

    def test_scale_estimation(self, rng):
        S_true, p1, p2, uv1, uv2, _ = self._make(rng, outlier_frac=0.0, fix_scale=False)
        P = p1.shape[0]
        res = sim3_opt.sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(P), jnp.ones(P), jnp.ones(P, bool), CAM,
            jax.random.PRNGKey(1), n_hypotheses=256, fix_scale=False,
        )
        assert abs(float(res.S12[7]) - float(S_true[7])) < 0.02


class TestPoseGraph:
    def test_loop_closure_distributes_drift(self, rng):
        """Chain of K nodes with odometry edges + one loop edge from a
        drifted endpoint back to the start; optimization should spread the
        accumulated drift (the CorrectLoop/OptimizeEssentialGraph role)."""
        K = 12
        # ground truth: nodes along a line
        gt = [np.asarray(lie.sim3_identity())]
        step = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
        for _ in range(K - 1):
            gt.append(np.asarray(lie.sim3_mul(lie.sim3_exp(step), jnp.asarray(gt[-1]))))
        gt = np.stack(gt)

        # odometry edges with small bias → drift
        edges_i, edges_j, Sij = [], [], []
        drift = jnp.asarray([0.02, 0.0, 0.0, 0.0, 0.004, 0.0, 0.0])
        nodes = [gt[0]]
        meas = lie.sim3_mul(lie.sim3_exp(step), lie.sim3_exp(drift))
        for k in range(1, K):
            nodes.append(np.asarray(lie.sim3_mul(meas, jnp.asarray(nodes[-1]))))
            edges_i.append(k)
            edges_j.append(k - 1)
            Sij.append(np.asarray(meas))
        nodes = np.stack(nodes)

        # loop edge: true relative transform between node K-1 and node 0
        S_loop = np.asarray(pose_graph.relative_sim3(jnp.asarray(gt), K - 1, 0))
        edges_i.append(K - 1)
        edges_j.append(0)
        Sij.append(S_loop)

        E = len(edges_i)
        problem = pose_graph.PoseGraphProblem(
            nodes=jnp.asarray(nodes.astype(np.float32)),
            node_fixed=jnp.asarray(np.eye(1, K, 0, dtype=bool)[0]),
            node_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array(edges_i, np.int32)),
            edge_j=jnp.asarray(np.array(edges_j, np.int32)),
            edge_Sij=jnp.asarray(np.stack(Sij).astype(np.float32)),
            edge_weight=jnp.concatenate([jnp.ones(E - 1), jnp.full((1,), 5.0)]).astype(jnp.float32),
            edge_valid=jnp.ones(E, bool),
        )
        out = pose_graph.optimize_pose_graph(problem, iterations=30)

        def err(a, b):
            return float(jnp.linalg.norm(lie.sim3_log(lie.sim3_mul(jnp.asarray(a), lie.sim3_inv(jnp.asarray(b))))))

        before = err(nodes[K - 1], gt[K - 1])
        after = err(np.asarray(out)[K - 1], gt[K - 1])
        assert after < 0.3 * before, (before, after)
        assert np.isfinite(np.asarray(out)).all()

    def test_fixed_node_untouched(self, rng):
        K = 5
        nodes = np.tile(np.asarray(lie.sim3_identity()), (K, 1)).astype(np.float32)
        nodes[1:, 4] += rng.normal(0, 0.1, (K - 1,))
        problem = pose_graph.PoseGraphProblem(
            nodes=jnp.asarray(nodes),
            node_fixed=jnp.asarray(np.eye(1, K, 0, dtype=bool)[0]),
            node_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.arange(1, K, dtype=np.int32)),
            edge_j=jnp.asarray(np.arange(0, K - 1, dtype=np.int32)),
            edge_Sij=jnp.tile(jnp.asarray(lie.sim3_identity()), (K - 1, 1)),
            edge_weight=jnp.ones(K - 1),
            edge_valid=jnp.ones(K - 1, bool),
        )
        out = np.asarray(pose_graph.optimize_pose_graph(problem, iterations=15))
        np.testing.assert_allclose(out[0], nodes[0], atol=1e-6)
        # chain collapses onto the fixed node
        np.testing.assert_allclose(out[:, 4], 0.0, atol=1e-3)

    def test_4dof_corrects_yaw_drift_preserves_tilt(self, rng):
        """Inertial variant (OptimizeEssentialGraph4DoF): a yaw+translation
        drifted chain is corrected by translation/yaw-only updates — the
        gravity-aligned tilt (roll/pitch) and scale of every node must be
        left exactly as given."""
        K = 10
        gt = [np.asarray(lie.sim3_identity())]
        step = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        for _ in range(K - 1):
            gt.append(np.asarray(lie.sim3_mul(lie.sim3_exp(step), jnp.asarray(gt[-1]))))
        gt = np.stack(gt)

        # odometry edges with small yaw + translation bias
        drift = jnp.asarray([0.03, 0.01, 0.0, 0.0, 0.0, 0.02, 0.0])
        meas = lie.sim3_mul(lie.sim3_exp(step), lie.sim3_exp(drift))
        nodes, edges_i, edges_j, Sij = [gt[0]], [], [], []
        for k in range(1, K):
            nodes.append(np.asarray(lie.sim3_mul(meas, jnp.asarray(nodes[-1]))))
            edges_i.append(k)
            edges_j.append(k - 1)
            Sij.append(np.asarray(meas))
        nodes = np.stack(nodes)

        S_loop = np.asarray(pose_graph.relative_sim3(jnp.asarray(gt), K - 1, 0))
        edges_i.append(K - 1)
        edges_j.append(0)
        Sij.append(S_loop)
        E = len(edges_i)

        problem = pose_graph.PoseGraphProblem(
            nodes=jnp.asarray(nodes.astype(np.float32)),
            node_fixed=jnp.asarray(np.eye(1, K, 0, dtype=bool)[0]),
            node_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array(edges_i, np.int32)),
            edge_j=jnp.asarray(np.array(edges_j, np.int32)),
            edge_Sij=jnp.asarray(np.stack(Sij).astype(np.float32)),
            edge_weight=jnp.concatenate([jnp.ones(E - 1), jnp.full((1,), 5.0)]).astype(jnp.float32),
            edge_valid=jnp.ones(E, bool),
        )
        out = np.asarray(pose_graph.optimize_pose_graph_4dof(problem, iterations=25))

        def err(a, b):
            return float(jnp.linalg.norm(lie.sim3_log(
                lie.sim3_mul(jnp.asarray(a), lie.sim3_inv(jnp.asarray(b))))))

        before = err(nodes[K - 1], gt[K - 1])
        after = err(out[K - 1], gt[K - 1])
        assert after < 0.4 * before, (before, after)
        # scale untouched
        np.testing.assert_allclose(out[:, 7], nodes[:, 7], atol=1e-6)
        # rotation update is yaw-only: R_out·R_inᵀ must be a rotation about world z
        for k in range(K):
            dq = np.asarray(lie.quat_mul(jnp.asarray(out[k, :4]),
                                         lie.quat_conj(jnp.asarray(nodes[k, :4]))))
            w = np.asarray(lie.so3_log(jnp.asarray(dq)))
            assert np.linalg.norm(w[:2]) < 1e-4, w
