"""Matrix-free PCG global BA: must match the explicit Schur solver."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.optim import local_ba, global_ba
from test_local_ba import synth_ba, CAM, pose_rmse


class TestGlobalBA:
    def test_matches_schur_on_small_problem(self, rng):
        problem, poses_gt, lms_gt, seen = synth_ba(rng, K=8, M=400, noise=0.2)
        res_pcg = global_ba.global_bundle_adjust(problem, CAM, iterations=10, cg_iters=30)
        res_schur = local_ba.bundle_adjust(problem, CAM, iterations=12)
        e_pcg = pose_rmse(np.asarray(res_pcg.poses), poses_gt)
        e_schur = pose_rmse(np.asarray(res_schur.poses), poses_gt)
        assert e_pcg < 0.05, (e_pcg, e_schur)
        assert e_pcg < max(3 * e_schur, 6e-3)

    def test_noise_free_exact(self, rng):
        problem, poses_gt, lms_gt, seen = synth_ba(rng, K=6, M=300, noise=0.0)
        res = global_ba.global_bundle_adjust(problem, CAM, iterations=10, cg_iters=40)
        assert pose_rmse(np.asarray(res.poses), poses_gt) < 2e-3
        lm_err = np.linalg.norm(np.asarray(res.landmarks)[seen] - lms_gt[seen], axis=1)
        assert np.median(lm_err) < 2e-2

    def test_larger_problem_runs(self, rng):
        # K beyond the Schur window cap — the regime this solver exists for
        problem, poses_gt, lms_gt, seen = synth_ba(rng, K=30, M=1500, D=5, noise=0.3)
        res = global_ba.global_bundle_adjust(problem, CAM, iterations=8, cg_iters=25)
        before = pose_rmse(np.asarray(problem.poses), poses_gt)
        after = pose_rmse(np.asarray(res.poses), poses_gt)
        assert after < 0.3 * before, (before, after)

    def test_fixed_pose_respected(self, rng):
        problem, *_ = synth_ba(rng, K=6, M=300)
        res = global_ba.global_bundle_adjust(problem, CAM, iterations=5)
        np.testing.assert_allclose(np.asarray(res.poses)[0], np.asarray(problem.poses)[0], atol=1e-6)
