"""Property tests for the Lie-group substrate (mirrors the role of the
vendored Sophus test suite, ``Thirdparty/Sophus/test/core``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from orb_slam3_rgbl_tpu.geometry import lie



def rand_quat(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = rng.normal(size=(64, 3))
        q = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_scipy = Rotation.from_rotvec(w).as_matrix()
        R_ours = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R_ours, R_scipy, atol=1e-9)

    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, size=(64, 1))
        w2 = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-7)

    def test_exp_small_angle(self):
        for scale in [0.0, 1e-12, 1e-8, 1e-5]:
            w = jnp.array([scale, 0.0, 0.0])
            q = lie.so3_exp(w)
            assert np.isfinite(np.asarray(q)).all()
            np.testing.assert_allclose(np.asarray(lie.so3_log(q)), np.asarray(w), atol=1e-9)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()

    def test_rotate_matches_matrix(self, rng):
        q = rand_quat(rng, 32)
        v = jnp.asarray(rng.normal(size=(32, 3)))
        out1 = lie.quat_rotate(q, v)
        out2 = jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-9)

    def test_matrix_quat_roundtrip(self, rng):
        q = rand_quat(rng, 128)
        q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-9)

    def test_matrix_quat_degenerate(self):
        # 180-degree rotations exercise every Shepperd branch
        for axis in np.eye(3):
            R = Rotation.from_rotvec(np.pi * axis).as_matrix()
            q = np.asarray(lie.matrix_to_quat(jnp.asarray(R)))
            R2 = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
            np.testing.assert_allclose(R2, R, atol=1e-9)

    def test_jacobians(self, rng):
        w = jnp.asarray(rng.normal(size=3))
        Jl = np.asarray(lie.so3_left_jacobian(w))
        Jl_inv = np.asarray(lie.so3_inv_left_jacobian(w))
        np.testing.assert_allclose(Jl @ Jl_inv, np.eye(3), atol=1e-9)
        # numerical check: exp(w + dw) ≈ exp(Jl dw) exp(w)
        dw = 1e-6 * np.asarray(rng.normal(size=3))
        lhs = np.asarray(lie.quat_to_matrix(lie.so3_exp(w + jnp.asarray(dw))))
        rhs = np.asarray(
            lie.quat_to_matrix(lie.quat_mul(lie.so3_exp(jnp.asarray(Jl @ dw)), lie.so3_exp(w)))
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


class TestSE3:
    def test_mul_inv(self, rng):
        a = lie.se3(rand_quat(rng, 16), jnp.asarray(rng.normal(size=(16, 3))))
        b = lie.se3(rand_quat(rng, 16), jnp.asarray(rng.normal(size=(16, 3))))
        ab = lie.se3_mul(a, b)
        ident = lie.se3_mul(ab, lie.se3_inv(ab))
        np.testing.assert_allclose(np.abs(np.asarray(ident[..., 0])), 1.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ident[..., 4:]), 0.0, atol=1e-9)

    def test_matrix_consistency(self, rng):
        a = lie.se3(rand_quat(rng, 16), jnp.asarray(rng.normal(size=(16, 3))))
        b = lie.se3(rand_quat(rng, 16), jnp.asarray(rng.normal(size=(16, 3))))
        M = np.asarray(lie.se3_to_matrix(lie.se3_mul(a, b)))
        M2 = np.asarray(lie.se3_to_matrix(a)) @ np.asarray(lie.se3_to_matrix(b))
        np.testing.assert_allclose(M, M2, atol=1e-9)

    def test_exp_log_roundtrip(self, rng):
        tau = rng.normal(size=(64, 6))
        # keep |omega| < pi — beyond that log() returns the wrapped
        # equivalent rotation and the roundtrip is not identity
        wn = np.linalg.norm(tau[:, 3:], axis=-1, keepdims=True)
        tau[:, 3:] *= np.where(wn > 3.0, 3.0 / wn, 1.0)
        tau = jnp.asarray(tau)
        tau2 = lie.se3_log(lie.se3_exp(tau))
        np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-7)

    def test_apply_matches_matrix(self, rng):
        T = lie.se3(rand_quat(rng, 8), jnp.asarray(rng.normal(size=(8, 3))))
        p = jnp.asarray(rng.normal(size=(8, 3)))
        out = np.asarray(lie.se3_apply(T, p))
        M = np.asarray(lie.se3_to_matrix(T))
        expected = np.einsum("nij,nj->ni", M[:, :3, :3], np.asarray(p)) + M[:, :3, 3]
        np.testing.assert_allclose(out, expected, atol=1e-9)

    def test_from_matrix_roundtrip(self, rng):
        T = lie.se3(rand_quat(rng, 8), jnp.asarray(rng.normal(size=(8, 3))))
        T = lie.se3(T[..., :4] * jnp.where(T[..., :1] < 0, -1.0, 1.0), T[..., 4:])
        T2 = lie.se3_from_matrix(lie.se3_to_matrix(T))
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-9)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        tau = jnp.asarray(rng.normal(size=(64, 7)) * 0.8)
        tau2 = lie.sim3_log(lie.sim3_exp(tau))
        np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-6)

    def test_exp_small(self):
        for v in [0.0, 1e-10, 1e-6]:
            tau = jnp.full((7,), v)
            S = lie.sim3_exp(tau)
            assert np.isfinite(np.asarray(S)).all()
            np.testing.assert_allclose(np.asarray(lie.sim3_log(S)), np.asarray(tau), atol=1e-8)

    def test_mul_apply_consistent(self, rng):
        a = lie.sim3_exp(jnp.asarray(rng.normal(size=7) * 0.5))
        b = lie.sim3_exp(jnp.asarray(rng.normal(size=7) * 0.5))
        p = jnp.asarray(rng.normal(size=(10, 3)))
        out1 = lie.sim3_apply(lie.sim3_mul(a, b), p)
        out2 = lie.sim3_apply(a, lie.sim3_apply(b, p))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-8)

    def test_inv(self, rng):
        a = lie.sim3_exp(jnp.asarray(rng.normal(size=7) * 0.5))
        ident = lie.sim3_mul(a, lie.sim3_inv(a))
        np.testing.assert_allclose(np.asarray(ident[4:7]), 0.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ident[7]), 1.0, atol=1e-9)

    def test_exp_matches_matrix_exponential(self, rng):
        """Independent check vs scipy expm of the sim3 Lie algebra element
        (catches self-consistent exp/log bugs the roundtrip test cannot)."""
        from scipy.linalg import expm

        for _ in range(10):
            tau = rng.normal(size=7) * 0.6
            rho, w, sigma = tau[:3], tau[3:6], tau[6]
            X = np.zeros((4, 4))
            X[:3, :3] = sigma * np.eye(3) + np.array(
                [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
            )
            X[:3, 3] = rho
            M = expm(X)
            S = np.asarray(lie.sim3_exp(jnp.asarray(tau)))
            sR = np.asarray(lie.quat_to_matrix(jnp.asarray(S[:4]))) * S[7]
            np.testing.assert_allclose(sR, M[:3, :3], atol=1e-6)
            np.testing.assert_allclose(S[4:7], M[:3, 3], atol=1e-6)

    def test_exp_inverse_property(self, rng):
        tau = jnp.asarray(rng.normal(size=7) * 0.5)
        ident = lie.sim3_mul(lie.sim3_exp(-tau), lie.sim3_exp(tau))
        np.testing.assert_allclose(np.asarray(ident[4:7]), 0.0, atol=1e-7)
        np.testing.assert_allclose(float(ident[7]), 1.0, atol=1e-9)

    def test_scale_application(self):
        S = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 2.0])  # pure scale ×2
        p = jnp.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(np.asarray(lie.sim3_apply(S, p)), [[2.0, 4.0, 6.0]], atol=1e-12)
