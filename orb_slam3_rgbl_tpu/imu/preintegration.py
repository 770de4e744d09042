"""On-manifold IMU preintegration (Forster et al.) — functional JAX.

Replaces ``IMU::Preintegrated`` (reference ``src/ImuTypes.cc``):
``IntegrateNewMeasurement`` (``:177-236``) updates (dP, dV, dR), the 9×9
covariance via the A/B system matrices, and the bias Jacobians
(JPa, JPg, JVa, JVg, JRg); ``GetDelta*`` (``:283-308``) apply first-order
bias corrections. The math is already pure-functional — it maps to a
``lax.scan`` over the measurement window, one fused kernel per frame
interval instead of the reference's per-sample C++ loop.

Conventions follow the reference: GRAVITY = (0, 0, −9.81) in world,
rotation right-Jacobian for the noise propagation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie

GRAVITY = 9.81
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)


class ImuBias(NamedTuple):
    bg: jax.Array  # (3,) gyro bias
    ba: jax.Array  # (3,) accel bias

    @staticmethod
    def zero(dtype=jnp.float32):
        return ImuBias(jnp.zeros(3, dtype), jnp.zeros(3, dtype))


class Preintegrated(NamedTuple):
    """Accumulated deltas between two frames/keyframes at linearization
    bias ``bias0`` (reference ``Preintegrated`` state, ``ImuTypes.h``)."""

    dt: jax.Array          # () total time
    dR: jax.Array          # (4,) quaternion ΔR
    dV: jax.Array          # (3,)
    dP: jax.Array          # (3,)
    # bias Jacobians
    JRg: jax.Array         # (3, 3) ∂ΔR/∂bg
    JVg: jax.Array         # (3, 3)
    JVa: jax.Array         # (3, 3)
    JPg: jax.Array         # (3, 3)
    JPa: jax.Array         # (3, 3)
    cov: jax.Array         # (9, 9) [θ, v, p] noise covariance
    bias0: ImuBias         # linearization point


def _init(dtype=jnp.float32) -> Preintegrated:
    return Preintegrated(
        dt=jnp.zeros((), dtype),
        dR=lie.quat_identity(dtype),
        dV=jnp.zeros(3, dtype),
        dP=jnp.zeros(3, dtype),
        JRg=jnp.zeros((3, 3), dtype),
        JVg=jnp.zeros((3, 3), dtype),
        JVa=jnp.zeros((3, 3), dtype),
        JPg=jnp.zeros((3, 3), dtype),
        JPa=jnp.zeros((3, 3), dtype),
        cov=jnp.zeros((9, 9), dtype),
        bias0=ImuBias.zero(dtype),
    )


@functools.partial(jax.jit, static_argnames=())
def preintegrate(
    acc: jax.Array,        # (S, 3) accelerometer samples
    gyro: jax.Array,       # (S, 3) gyroscope samples
    dts: jax.Array,        # (S,) per-sample integration intervals
    valid: jax.Array,      # (S,) bool — padded samples masked out
    bias: ImuBias,
    noise_acc: float = 2e-3,
    noise_gyro: float = 1.7e-4,
) -> Preintegrated:
    """Integrate a (padded, fixed-length) measurement window.

    Equivalent to looping ``IntegrateNewMeasurement`` (reference
    ``ImuTypes.cc:177-236``) over the samples: position/velocity update
    with the current ΔR, covariance propagation through the A/B matrices,
    bias-Jacobian recursion, then the rotation update.
    """
    dtype = acc.dtype
    bias = ImuBias(bias.bg.astype(dtype), bias.ba.astype(dtype))
    Nga = jnp.diag(
        jnp.concatenate([jnp.full(3, noise_gyro**2), jnp.full(3, noise_acc**2)]).astype(dtype)
    )

    def step(state: Preintegrated, inp):
        a, w, dt, ok = inp
        dt = jnp.where(ok, dt, 0.0)
        a = a - state.bias0.ba
        w = w - state.bias0.bg

        R = lie.quat_to_matrix(state.dR)
        a_hat = lie.so3_hat(a)

        # position & velocity with current rotation (pre-update order
        # matches the reference)
        dP = state.dP + state.dV * dt + 0.5 * R @ a * dt * dt
        dV = state.dV + R @ a * dt

        # covariance propagation: x = [θ, v, p]
        dRi_t = lie.so3_exp(w * dt)
        Ri = lie.quat_to_matrix(dRi_t)
        Jr = lie.so3_right_jacobian(w * dt)
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(Ri.T)
        A = A.at[3:6, 0:3].set(-R @ a_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * R @ a_hat * dt * dt)
        A = A.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype))
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(R * dt)
        B = B.at[6:9, 3:6].set(0.5 * R * dt * dt)
        cov = A @ state.cov @ A.T + B @ Nga @ B.T
        cov = jnp.where(ok, cov, state.cov)

        # bias jacobians (reference ImuTypes.cc:214-219)
        JPa = state.JPa + state.JVa * dt - 0.5 * R * dt * dt
        JPg = state.JPg + state.JVg * dt - 0.5 * R @ a_hat @ state.JRg * dt * dt
        JVa = state.JVa - R * dt
        JVg = state.JVg - R @ a_hat @ state.JRg * dt
        JRg = Ri.T @ state.JRg - Jr * dt

        dR = lie.quat_normalize(lie.quat_mul(state.dR, dRi_t))

        new = Preintegrated(
            dt=state.dt + dt,
            dR=jnp.where(ok, dR, state.dR),
            dV=jnp.where(ok, dV, state.dV),
            dP=jnp.where(ok, dP, state.dP),
            JRg=jnp.where(ok, JRg, state.JRg),
            JVg=jnp.where(ok, JVg, state.JVg),
            JVa=jnp.where(ok, JVa, state.JVa),
            JPg=jnp.where(ok, JPg, state.JPg),
            JPa=jnp.where(ok, JPa, state.JPa),
            cov=cov,
            bias0=state.bias0,
        )
        return new, None

    init = _init(dtype)._replace(bias0=bias)
    out, _ = jax.lax.scan(step, init, (acc, gyro, dts, valid))
    return out


@jax.jit
def merge(p1: Preintegrated, p2: Preintegrated) -> Preintegrated:
    """Compose two consecutive preintegrated segments A→B (``p1``) and
    B→C (``p2``) into A→C — the keyframe-culling relink of the temporal
    IMU chain (reference ``Preintegrated::MergePrevious``,
    ``ImuTypes.cc:237``, which re-integrates stored measurements; here the
    composition is analytic, exact for the deltas and first-order for the
    bias Jacobians / covariance — the same order as the recursion itself).

    ``p2`` is first re-linearized to ``p1.bias0`` via its bias Jacobians
    so the merged segment has a single linearization point.
    """
    b = p1.bias0
    # re-express segment 2 at p1's linearization bias
    dR2 = delta_rotation(p2, b)
    dV2 = delta_velocity(p2, b)
    dP2 = delta_position(p2, b)
    R1 = lie.quat_to_matrix(p1.dR)
    R2 = lie.quat_to_matrix(dR2)
    dt2 = p2.dt

    dR = lie.quat_normalize(lie.quat_mul(p1.dR, dR2))
    dV = p1.dV + R1 @ dV2
    dP = p1.dP + p1.dV * dt2 + R1 @ dP2

    # bias Jacobians of the composition (chain rule through R1(bg))
    hV2 = lie.so3_hat(dV2)
    hP2 = lie.so3_hat(dP2)
    JRg = R2.T @ p1.JRg + p2.JRg
    JVg = p1.JVg - R1 @ hV2 @ p1.JRg + R1 @ p2.JVg
    JVa = p1.JVa + R1 @ p2.JVa
    JPg = p1.JPg + p1.JVg * dt2 - R1 @ hP2 @ p1.JRg + R1 @ p2.JPg
    JPa = p1.JPa + p1.JVa * dt2 + R1 @ p2.JPa

    # covariance: transport segment-1 errors through segment 2 + add seg-2
    dtype = p1.cov.dtype
    F = jnp.zeros((9, 9), dtype)
    F = F.at[0:3, 0:3].set(R2.T)
    F = F.at[3:6, 0:3].set(-R1 @ hV2)
    F = F.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
    F = F.at[6:9, 0:3].set(-R1 @ hP2)
    F = F.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * dt2)
    F = F.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype))
    G = jnp.zeros((9, 9), dtype)
    G = G.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    G = G.at[3:6, 3:6].set(R1)
    G = G.at[6:9, 6:9].set(R1)
    cov = F @ p1.cov @ F.T + G @ p2.cov @ G.T

    return Preintegrated(
        dt=p1.dt + dt2, dR=dR, dV=dV, dP=dP,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
        cov=cov, bias0=b,
    )


def delta_rotation(p: Preintegrated, bias: ImuBias) -> jax.Array:
    """ΔR corrected to a new gyro bias (reference ``GetDeltaRotation``,
    ``ImuTypes.cc:283``): dR · exp(JRg · δbg)."""
    dbg = bias.bg - p.bias0.bg
    return lie.quat_mul(p.dR, lie.so3_exp(p.JRg @ dbg))


def delta_velocity(p: Preintegrated, bias: ImuBias) -> jax.Array:
    dbg = bias.bg - p.bias0.bg
    dba = bias.ba - p.bias0.ba
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, bias: ImuBias) -> jax.Array:
    dbg = bias.bg - p.bias0.bg
    dba = bias.ba - p.bias0.ba
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def predict_state(Rwb: jax.Array, vw: jax.Array, pw: jax.Array,
                  p: Preintegrated, bias: ImuBias):
    """Propagate (R, v, p) through the preintegrated window
    (≡ ``Tracking::PredictStateIMU``, reference ``Tracking.cc:1772``)."""
    g = GRAVITY_VEC.astype(p.dP.dtype)
    dt = p.dt
    R1 = lie.quat_mul(Rwb, delta_rotation(p, bias))
    Rm = lie.quat_to_matrix(Rwb)
    v1 = vw + g * dt + Rm @ delta_velocity(p, bias)
    p1 = pw + vw * dt + 0.5 * g * dt * dt + Rm @ delta_position(p, bias)
    return R1, v1, p1


def inertial_residual(
    p: Preintegrated,
    Rwb1, vw1, pw1,
    Rwb2, vw2, pw2,
    bias: ImuBias,
):
    """9-vector preintegration residual [r_ΔR, r_Δv, r_Δp] between two
    states (≡ ``EdgeInertial::computeError``, reference ``G2oTypes.cc``)."""
    g = GRAVITY_VEC.astype(p.dP.dtype)
    dt = p.dt
    R1t = lie.quat_conj(Rwb1)
    er = lie.so3_log(
        lie.quat_mul(lie.quat_conj(delta_rotation(p, bias)), lie.quat_mul(R1t, Rwb2))
    )
    R1m = lie.quat_to_matrix(R1t)
    ev = R1m @ (vw2 - vw1 - g * dt) - delta_velocity(p, bias)
    ep = R1m @ (pw2 - pw1 - vw1 * dt - 0.5 * g * dt * dt) - delta_position(p, bias)
    return jnp.concatenate([er, ev, ep])
