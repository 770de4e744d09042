"""Monocular two-view reconstruction tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie, camera, two_view
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config

CAM = kitti_rgbl_config().camera


def synth_pair(rng, n=300, baseline=0.9, yaw=0.02, noise=0.3, outlier_frac=0.0, planar=False):
    # baseline chosen so the 50th-best parallax clears the reconstruction
    # acceptance gate (reference minParallax = 1.0°): at z ∈ [10, 60] m a
    # 0.9 m baseline puts ~2/3 of the points above 1°; marginal-parallax
    # rejection has its own test (test_rejects_pure_rotation)
    if planar:
        pts = np.stack(
            [rng.uniform(-20, 20, n), rng.uniform(-6, 6, n), np.full(n, 25.0)], axis=1
        ).astype(np.float32)
    else:
        pts = np.stack(
            [rng.uniform(-20, 20, n), rng.uniform(-6, 6, n), rng.uniform(10, 60, n)], axis=1
        ).astype(np.float32)
    q = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
    T21 = np.concatenate([q, np.array([-baseline, 0.0, 0.0], np.float32)])
    uv1 = np.array(camera.project(CAM, jnp.asarray(pts)))
    p2 = np.asarray(lie.se3_apply(jnp.asarray(T21), jnp.asarray(pts)))
    uv2 = np.array(camera.project(CAM, jnp.asarray(p2)))
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    ok = (
        (uv1[:, 0] > 0) & (uv1[:, 0] < CAM.width) & (uv1[:, 1] > 0) & (uv1[:, 1] < CAM.height)
        & (uv2[:, 0] > 0) & (uv2[:, 0] < CAM.width) & (uv2[:, 1] > 0) & (uv2[:, 1] < CAM.height)
    )
    return (
        jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)),
        jnp.asarray(ok), T21, pts,
    )


def rot_err(q_est, q_true):
    dq = lie.quat_mul(lie.quat_conj(jnp.asarray(q_true)), jnp.asarray(q_est))
    return float(jnp.linalg.norm(lie.so3_log(dq)))


class TestTwoView:
    def test_recovers_motion(self, rng):
        uv1, uv2, ok, T21_true, pts = synth_pair(rng)
        res = two_view.reconstruct_two_views(uv1, uv2, ok, CAM, jax.random.PRNGKey(0))
        assert bool(res.success)
        # direction of translation (scale is unobservable in mono)
        t_est = np.asarray(res.T21[4:])
        t_true = T21_true[4:]
        cos = np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
        assert cos > 0.999, cos
        assert rot_err(np.asarray(res.T21[:4]), T21_true[:4]) < 0.01

    def test_triangulated_structure_consistent(self, rng):
        uv1, uv2, ok, T21_true, pts = synth_pair(rng, noise=0.1)
        res = two_view.reconstruct_two_views(uv1, uv2, ok, CAM, jax.random.PRNGKey(1))
        assert bool(res.success)
        good = np.asarray(res.is_good)
        assert good.sum() > 150
        X = np.asarray(res.points)[good]
        gt = pts[good]
        # mono scale ambiguity: compare after median-ratio normalization
        s = np.median(gt[:, 2]) / np.median(X[:, 2])
        err = np.linalg.norm(X * s - gt, axis=1)
        assert np.median(err) < 1.0, np.median(err)  # sigma_z ~ z^2*px/(f*b) ~ 0.25-1 m here

    def test_robust_to_outliers(self, rng):
        uv1, uv2, ok, T21_true, pts = synth_pair(rng, outlier_frac=0.2)
        res = two_view.reconstruct_two_views(uv1, uv2, ok, CAM, jax.random.PRNGKey(2))
        assert bool(res.success)
        assert rot_err(np.asarray(res.T21[:4]), T21_true[:4]) < 0.02

    def test_rejects_pure_rotation(self, rng):
        # no baseline → no parallax → must NOT report a confident init
        uv1, uv2, ok, T21_true, pts = synth_pair(rng, baseline=0.0, yaw=0.03, noise=0.2)
        res = two_view.reconstruct_two_views(uv1, uv2, ok, CAM, jax.random.PRNGKey(3))
        assert not bool(res.success)
