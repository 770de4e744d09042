"""Schur-complement bundle adjustment tests on synthetic scenes."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie, camera
from orb_slam3_rgbl_tpu.optim import local_ba
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config

CAM = kitti_rgbl_config().camera


def synth_ba(rng, K=6, M=300, D=6, noise=0.2, stereo_frac=0.6, perturb=True):
    """A forward-moving camera observing a random point cloud."""
    # ground-truth trajectory: camera moves forward along z, slight turns
    poses_gt = []
    T = np.asarray(lie.se3_identity(jnp.float32))
    for k in range(K):
        tau = np.array([0.05 * rng.normal(), 0.02 * rng.normal(), 1.2, 0.005 * rng.normal(), 0.01 * rng.normal(), 0.002 * rng.normal()], np.float32)
        T = np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(tau)), jnp.asarray(T)))
        poses_gt.append(T)
    poses_gt = np.stack(poses_gt)  # (K, 7) Tcw

    lms_gt = np.stack(
        [rng.uniform(-25, 25, M), rng.uniform(-6, 6, M), rng.uniform(15, 90, M)], axis=1
    ).astype(np.float32)

    obs_kf = np.zeros((M, D), np.int32)
    obs_uv = np.zeros((M, D, 2), np.float32)
    obs_ur = np.full((M, D), -1.0, np.float32)
    obs_mask = np.zeros((M, D), bool)
    for m in range(M):
        ks = rng.choice(K, size=min(D, K), replace=False)
        d = 0
        for k in ks:
            pc = np.asarray(lie.se3_apply(jnp.asarray(poses_gt[k]), jnp.asarray(lms_gt[m])))
            if pc[2] < 1.0:
                continue
            uv = np.array(camera.project(CAM, jnp.asarray(pc)))
            if not (0 <= uv[0] < CAM.width and 0 <= uv[1] < CAM.height):
                continue
            obs_kf[m, d] = k
            obs_uv[m, d] = uv + rng.normal(0, noise, 2)
            if rng.uniform() < stereo_frac:
                obs_ur[m, d] = uv[0] - CAM.bf / pc[2] + rng.normal(0, noise)
            obs_mask[m, d] = True
            d += 1
    seen = obs_mask.sum(1) >= 2

    # perturb initial guess (first pose fixed as gauge)
    poses0 = poses_gt.copy()
    lms0 = lms_gt + (rng.normal(0, 0.3, lms_gt.shape).astype(np.float32) if perturb else 0.0)
    if perturb:
        for k in range(1, K):
            tau = np.concatenate([rng.normal(0, 0.15, 3), rng.normal(0, 0.01, 3)]).astype(np.float32)
            poses0[k] = np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(tau)), jnp.asarray(poses_gt[k])))

    fixed = np.zeros(K, bool)
    fixed[0] = True
    problem = local_ba.BAProblem(
        poses=jnp.asarray(poses0),
        pose_fixed=jnp.asarray(fixed),
        pose_valid=jnp.ones(K, bool),
        landmarks=jnp.asarray(lms0),
        lm_valid=jnp.asarray(seen),
        obs_kf=jnp.asarray(obs_kf),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((M, D), jnp.float32),
        obs_mask=jnp.asarray(obs_mask),
    )
    return problem, poses_gt, lms_gt, seen


def pose_rmse(a, b):
    errs = [float(jnp.linalg.norm(lie.se3_log(lie.se3_mul(lie.se3_inv(jnp.asarray(x)), jnp.asarray(y))))) for x, y in zip(a, b)]
    return float(np.sqrt(np.mean(np.square(errs))))


class TestBundleAdjust:
    def test_recovers_noise_free_scene(self, rng):
        problem, poses_gt, lms_gt, seen = synth_ba(rng, noise=0.0)
        res = local_ba.bundle_adjust(problem, CAM, iterations=15)
        assert pose_rmse(np.asarray(res.poses), poses_gt) < 1e-3
        lm_err = np.linalg.norm(np.asarray(res.landmarks)[seen] - lms_gt[seen], axis=1)
        assert np.median(lm_err) < 1e-2

    def test_noisy_scene_improves(self, rng):
        problem, poses_gt, lms_gt, seen = synth_ba(rng, noise=0.4)
        before = pose_rmse(np.asarray(problem.poses), poses_gt)
        res = local_ba.bundle_adjust(problem, CAM, iterations=15)
        after = pose_rmse(np.asarray(res.poses), poses_gt)
        assert after < 0.2 * before, (before, after)

    def test_fixed_pose_untouched(self, rng):
        problem, poses_gt, *_ = synth_ba(rng)
        res = local_ba.bundle_adjust(problem, CAM, iterations=8)
        np.testing.assert_allclose(np.asarray(res.poses)[0], np.asarray(problem.poses)[0], atol=1e-6)

    def test_outlier_classification(self, rng):
        problem, poses_gt, lms_gt, seen = synth_ba(rng, noise=0.2)
        uv = np.array(problem.obs_uv)
        mask = np.asarray(problem.obs_mask)
        # corrupt 10% of observations
        corrupt = (np.random.default_rng(1).uniform(size=mask.shape) < 0.1) & mask
        uv[corrupt] += 40.0
        problem = problem._replace(obs_uv=jnp.asarray(uv))
        res = local_ba.bundle_adjust(problem, CAM, iterations=15)
        inl = np.asarray(res.obs_inlier)
        assert inl[corrupt].mean() < 0.1, inl[corrupt].mean()
        clean = mask & ~corrupt
        assert inl[clean].mean() > 0.85, inl[clean].mean()

    def test_cost_monotone_improvement(self, rng):
        problem, *_ = synth_ba(rng, noise=0.3)
        r5 = local_ba.bundle_adjust(problem, CAM, iterations=5)
        r15 = local_ba.bundle_adjust(problem, CAM, iterations=15)
        assert float(r15.cost) <= float(r5.cost) * 1.01
