"""IMU preintegration tests vs direct numerical integration."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.imu import preintegration as pre


def simulate(rng, S=100, dt=0.005, omega=None, acc_body=None):
    """Ground-truth trajectory with constant body rates; returns samples
    and final state. Gravity included in accelerometer measurements."""
    g = np.array([0.0, 0.0, -pre.GRAVITY])
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    omega = omega if omega is not None else np.array([0.1, -0.2, 0.3])
    acc_body = acc_body if acc_body is not None else np.array([0.5, 0.1, -0.2])
    accs, gyrs = [], []
    for _ in range(S):
        # accelerometer measures specific force: a_meas = Rᵀ(a_world − g)
        a_world = R @ acc_body
        accs.append(R.T @ (a_world - g))
        gyrs.append(omega)
        # integrate (matching preintegration's Euler order: p, v then R)
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        from scipy.spatial.transform import Rotation
        R = R @ Rotation.from_rotvec(omega * dt).as_matrix()
    return (
        np.array(accs, np.float32),
        np.array(gyrs, np.float32),
        np.full(S, dt, np.float32),
        R, v, p,
    )


class TestPreintegration:
    def test_matches_direct_integration(self, rng):
        accs, gyrs, dts, R_end, v_end, p_end = simulate(rng)
        out = pre.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(len(dts), bool), pre.ImuBias.zero(),
        )
        # predict world state from identity start with zero velocity
        Rq, v1, p1 = pre.predict_state(
            lie.quat_identity(), jnp.zeros(3), jnp.zeros(3), out, pre.ImuBias.zero()
        )
        np.testing.assert_allclose(np.asarray(lie.quat_to_matrix(Rq)), R_end, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v1), v_end, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(p1), p_end, rtol=1e-3, atol=1e-4)

    def test_residual_zero_at_truth(self, rng):
        accs, gyrs, dts, R_end, v_end, p_end = simulate(rng)
        out = pre.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(len(dts), bool), pre.ImuBias.zero(),
        )
        r = pre.inertial_residual(
            out,
            lie.quat_identity(), jnp.zeros(3), jnp.zeros(3),
            lie.matrix_to_quat(jnp.asarray(R_end.astype(np.float32))),
            jnp.asarray(v_end.astype(np.float32)), jnp.asarray(p_end.astype(np.float32)),
            pre.ImuBias.zero(),
        )
        assert np.abs(np.asarray(r)).max() < 5e-3, np.asarray(r)

    def test_bias_jacobian_first_order(self, rng):
        accs, gyrs, dts, *_ = simulate(rng)
        valid = jnp.ones(len(dts), bool)
        b0 = pre.ImuBias.zero()
        out0 = pre.preintegrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), valid, b0)
        db = 1e-3
        bg = pre.ImuBias(jnp.asarray([db, 0.0, 0.0]), jnp.zeros(3))
        # reintegrate with shifted bias (ground truth of the correction)
        out1 = pre.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), valid,
            pre.ImuBias(jnp.zeros(3), jnp.zeros(3)),
        )
        # first-order corrected deltas at bias bg should match reintegration
        # with measurements already debiased by bg
        accs2 = accs  # accelerometer bias unchanged
        gyrs2 = gyrs - np.array([db, 0, 0], np.float32)
        ref = pre.preintegrate(jnp.asarray(accs2), jnp.asarray(gyrs2), jnp.asarray(dts), valid, b0)
        dR_corr = pre.delta_rotation(out0, bg)
        dV_corr = pre.delta_velocity(out0, bg)
        dP_corr = pre.delta_position(out0, bg)
        np.testing.assert_allclose(
            np.asarray(lie.quat_to_matrix(dR_corr)),
            np.asarray(lie.quat_to_matrix(ref.dR)), atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(dV_corr), np.asarray(ref.dV), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dP_corr), np.asarray(ref.dP), atol=1e-4)

    def test_padding_mask(self, rng):
        accs, gyrs, dts, *_ = simulate(rng, S=50)
        pad = 30
        accs_p = np.concatenate([accs, rng.normal(size=(pad, 3)).astype(np.float32)])
        gyrs_p = np.concatenate([gyrs, rng.normal(size=(pad, 3)).astype(np.float32)])
        dts_p = np.concatenate([dts, np.full(pad, 0.005, np.float32)])
        valid = np.concatenate([np.ones(50, bool), np.zeros(pad, bool)])
        out_p = pre.preintegrate(
            jnp.asarray(accs_p), jnp.asarray(gyrs_p), jnp.asarray(dts_p),
            jnp.asarray(valid), pre.ImuBias.zero(),
        )
        out = pre.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(50, bool), pre.ImuBias.zero(),
        )
        np.testing.assert_allclose(float(out_p.dt), float(out.dt), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out_p.dP), np.asarray(out.dP), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_p.dR), np.asarray(out.dR), atol=1e-6)

    def test_covariance_psd_and_growing(self, rng):
        accs, gyrs, dts, *_ = simulate(rng)
        half = pre.preintegrate(
            jnp.asarray(accs[:50]), jnp.asarray(gyrs[:50]), jnp.asarray(dts[:50]),
            jnp.ones(50, bool), pre.ImuBias.zero(),
        )
        full = pre.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(100, bool), pre.ImuBias.zero(),
        )
        ev_half = np.linalg.eigvalsh(np.asarray(half.cov))
        ev_full = np.linalg.eigvalsh(np.asarray(full.cov))
        assert ev_half.min() >= -1e-12
        assert np.trace(np.asarray(full.cov)) > np.trace(np.asarray(half.cov))


class TestMerge:
    def test_merge_matches_direct(self, rng):
        """merge(A→B, B→C) must equal integrating A→C directly (the
        keyframe-culling chain weld, reference MergePrevious)."""
        S = 60
        acc = rng.normal(0, 1, (S, 3)).astype(np.float32) + np.array([0, 0, pre.GRAVITY], np.float32)
        gyr = rng.normal(0, 0.3, (S, 3)).astype(np.float32)
        dts = np.full(S, 0.01, np.float32)
        ok = np.ones(S, bool)
        bias = pre.ImuBias(jnp.asarray([0.01, -0.02, 0.005]), jnp.asarray([0.05, 0.02, -0.03]))
        full = pre.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), jnp.asarray(ok), bias)
        h = S // 2
        p1 = pre.preintegrate(jnp.asarray(acc[:h]), jnp.asarray(gyr[:h]), jnp.asarray(dts[:h]), jnp.asarray(ok[:h]), bias)
        p2 = pre.preintegrate(jnp.asarray(acc[h:]), jnp.asarray(gyr[h:]), jnp.asarray(dts[h:]), jnp.asarray(ok[h:]), bias)
        m = pre.merge(p1, p2)
        for f in ("dt", "dR", "dV", "dP", "JRg", "JVg", "JVa", "JPg", "JPa"):
            np.testing.assert_allclose(
                np.asarray(getattr(m, f)), np.asarray(getattr(full, f)),
                atol=5e-4, err_msg=f,
            )
        cov_f, cov_m = np.asarray(full.cov), np.asarray(m.cov)
        assert np.abs(cov_f - cov_m).max() <= 1e-3 * max(np.abs(cov_f).max(), 1e-12)

    def test_merge_relinearizes_second_segment(self, rng):
        """Segments integrated at different biases still merge correctly
        (first-order in the bias delta)."""
        S = 60
        acc = rng.normal(0, 1, (S, 3)).astype(np.float32) + np.array([0, 0, pre.GRAVITY], np.float32)
        gyr = rng.normal(0, 0.3, (S, 3)).astype(np.float32)
        dts = np.full(S, 0.01, np.float32)
        ok = np.ones(S, bool)
        bias = pre.ImuBias(jnp.asarray([0.01, -0.02, 0.005]), jnp.asarray([0.05, 0.02, -0.03]))
        full = pre.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), jnp.asarray(ok), bias)
        h = S // 2
        p1 = pre.preintegrate(jnp.asarray(acc[:h]), jnp.asarray(gyr[:h]), jnp.asarray(dts[:h]), jnp.asarray(ok[:h]), bias)
        p2 = pre.preintegrate(jnp.asarray(acc[h:]), jnp.asarray(gyr[h:]), jnp.asarray(dts[h:]), jnp.asarray(ok[h:]), pre.ImuBias.zero())
        m = pre.merge(p1, p2)
        for f in ("dR", "dV", "dP"):
            np.testing.assert_allclose(
                np.asarray(getattr(m, f)), np.asarray(getattr(full, f)),
                atol=2e-2, err_msg=f,
            )
