"""Motion-only BA tests on synthetic scenes (replaces the role of g2o's
PoseOptimization; verified for convergence, outlier robustness, and
mono/stereo residual handling)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie, camera
from orb_slam3_rgbl_tpu.optim import pose_opt
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config

CAM = kitti_rgbl_config().camera


def synth_scene(rng, m=200, noise=0.3, outlier_frac=0.0, stereo_frac=0.7):
    Xw = np.stack(
        [rng.uniform(-20, 20, m), rng.uniform(-5, 5, m), rng.uniform(8, 60, m)], axis=1
    ).astype(np.float32)
    # true pose: modest rotation + translation
    tau = np.array([0.3, -0.1, 0.5, 0.02, -0.03, 0.01], np.float32)
    Tcw = lie.se3_exp(jnp.asarray(tau))
    pc = np.asarray(lie.se3_apply(Tcw, jnp.asarray(Xw)))
    uv = np.array(camera.project(CAM, jnp.asarray(pc)))
    uv += rng.normal(0, noise, uv.shape)
    ur = uv[:, 0] - CAM.bf / pc[:, 2] + rng.normal(0, noise, m)
    is_stereo = rng.uniform(size=m) < stereo_frac
    ur = np.where(is_stereo, ur, -1.0).astype(np.float32)

    n_out = int(outlier_frac * m)
    if n_out:
        idx = rng.choice(m, n_out, replace=False)
        uv[idx] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    obs = pose_opt.PoseObs(
        Xw=jnp.asarray(Xw),
        uv=jnp.asarray(uv.astype(np.float32)),
        u_right=jnp.asarray(ur),
        inv_sigma2=jnp.ones((m,), jnp.float32),
        valid=jnp.ones((m,), bool),
    )
    return Tcw, obs, (np.arange(m) if not n_out else np.setdiff1d(np.arange(m), idx))


def pose_error(Ta, Tb):
    d = lie.se3_mul(lie.se3_inv(Ta), Tb)
    return float(jnp.linalg.norm(lie.se3_log(d)))


class TestPoseOptimize:
    def test_converges_from_perturbed_init(self, rng):
        T_true, obs, _ = synth_scene(rng, noise=0.0)
        T0 = lie.se3_mul(lie.se3_exp(jnp.asarray([0.5, -0.3, 0.4, 0.03, 0.02, -0.04], jnp.float32)), T_true)
        res = pose_opt.pose_optimize(T0, obs, CAM)
        assert pose_error(res.Tcw, T_true) < 1e-3, pose_error(res.Tcw, T_true)
        assert int(res.n_inliers) == obs.Xw.shape[0]

    def test_noise_bounded_error(self, rng):
        T_true, obs, _ = synth_scene(rng, noise=0.5)
        T0 = lie.se3_mul(lie.se3_exp(jnp.asarray([0.2, 0.1, -0.2, 0.01, -0.01, 0.02], jnp.float32)), T_true)
        res = pose_opt.pose_optimize(T0, obs, CAM)
        assert pose_error(res.Tcw, T_true) < 0.02
        assert int(res.n_inliers) > 150

    def test_outlier_rejection(self, rng):
        T_true, obs, inlier_idx = synth_scene(rng, noise=0.3, outlier_frac=0.25)
        T0 = lie.se3_mul(lie.se3_exp(jnp.asarray([0.2, 0.1, -0.2, 0.01, -0.01, 0.02], jnp.float32)), T_true)
        res = pose_opt.pose_optimize(T0, obs, CAM)
        assert pose_error(res.Tcw, T_true) < 0.03, pose_error(res.Tcw, T_true)
        flagged_in = np.asarray(res.inliers)
        # most injected outliers rejected
        out_idx = np.setdiff1d(np.arange(obs.Xw.shape[0]), inlier_idx)
        assert flagged_in[out_idx].mean() < 0.1
        assert flagged_in[inlier_idx].mean() > 0.9

    def test_mono_only_scene(self, rng):
        T_true, obs, _ = synth_scene(rng, noise=0.2, stereo_frac=0.0)
        T0 = lie.se3_mul(lie.se3_exp(jnp.asarray([0.1, 0.05, -0.1, 0.01, 0.0, 0.01], jnp.float32)), T_true)
        res = pose_opt.pose_optimize(T0, obs, CAM)
        assert pose_error(res.Tcw, T_true) < 0.02

    def test_invalid_mask_respected(self, rng):
        T_true, obs, _ = synth_scene(rng, noise=0.0)
        # corrupt half the observations but mark them invalid
        m = obs.Xw.shape[0]
        uv = np.array(obs.uv)
        uv[: m // 2] += 500.0
        valid = np.ones(m, bool)
        valid[: m // 2] = False
        obs = obs._replace(uv=jnp.asarray(uv), valid=jnp.asarray(valid))
        T0 = lie.se3_mul(lie.se3_exp(jnp.asarray([0.2, 0.0, 0.1, 0.0, 0.01, 0.0], jnp.float32)), T_true)
        res = pose_opt.pose_optimize(T0, obs, CAM)
        assert pose_error(res.Tcw, T_true) < 1e-3
        assert int(res.n_inliers) == m - m // 2
