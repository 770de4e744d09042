"""SO3 / SE3 / Sim3 Lie groups on flat JAX arrays.

Replaces the reference's vendored Sophus library (``Thirdparty/Sophus``,
used for all pose algebra — e.g. ``Sophus::SE3f`` returned by
``Tracking::GrabImageRGBL``, reference ``Tracking.h:73-76``).

Representations (all jit/vmap-safe, trailing-axis layout):

* **SO3**: unit quaternion ``[w, x, y, z]`` — shape ``(..., 4)``.
* **SE3**: ``[qw, qx, qy, qz, tx, ty, tz]`` — shape ``(..., 7)``.
* **Sim3**: ``[qw, qx, qy, qz, tx, ty, tz, s]`` — shape ``(..., 8)``
  (``s`` is the linear scale, rotation part stays a unit quaternion).

Tangent ordering: ``se3`` tangent is ``[rho(3), omega(3)]`` (translation
block first); ``sim3`` tangent is ``[rho(3), omega(3), sigma]`` with
``sigma = log(s)``.

All exp/log maps use Taylor guards near the identity so gradients stay
finite at ``theta == 0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternion core
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b (both ``[w,x,y,z]``)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` (..., 3) by quaternion(s) ``q`` (..., 4)."""
    w = q[..., :1]
    xyz = q[..., 1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) unit quaternion → (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix → (..., 4) unit quaternion (w ≥ 0).

    Branch-free Shepperd's method: compute all four candidate quaternions
    scaled by their pivot and select the one with the largest pivot —
    vmap/jit safe (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot (1 + ...) is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) → (..., 3, 3) skew-symmetric matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    m = jnp.stack([zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_vee(m: jax.Array) -> jax.Array:
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) → unit quaternion (..., 4)."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)  # guarded; exact value unused near 0
    half = 0.5 * theta
    small = theta_sq < _EPS
    # sin(t/2)/t : Taylor 0.5 - t^2/48 near 0
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) → axis-angle (..., 3)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # w >= 0 ⇒ theta in [0, pi]
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    n_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    n = jnp.sqrt(n_sq + _EPS * _EPS)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n_sq < _EPS
    # theta / sin(theta/2) == theta / n ; near 0: 2/w * (1 + n^2/(3 w^2)) ≈ 2 + ...
    k = jnp.where(small, 2.0 / jnp.maximum(w, 0.5) + 2.0 * n_sq / 3.0, theta / n)
    return k * xyz


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian of SO3 at tangent ``w`` — (..., 3, 3).

    J_l = I + (1-cos θ)/θ² Ω + (θ - sin θ)/θ³ Ω².
    Mirrors the role of ``IMU::RightJacobianSO3`` (reference
    ``ImuTypes.cc:53-66``): ``J_r(w) = J_l(-w)``.
    """
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    omega = so3_hat(w)
    omega2 = omega @ omega
    small = theta_sq < _EPS
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), omega.shape)
    return eye + a * omega + b * omega2


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    return so3_left_jacobian(-w)


def so3_inv_left_jacobian(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian: J_l^{-1} = I - Ω/2 + c Ω² with
    c = 1/θ² − (1+cos θ)/(2 θ sin θ)."""
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    omega = so3_hat(w)
    omega2 = omega @ omega
    small = theta_sq < _EPS
    sin_t = jnp.sin(theta)
    c = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / theta_sq - (1.0 + jnp.cos(theta)) / (2.0 * theta * sin_t),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), omega.shape)
    return eye - 0.5 * omega + c * omega2


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def se3(q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([q, t], axis=-1)


def se3_rot(T: jax.Array) -> jax.Array:
    return T[..., :4]


def se3_trans(T: jax.Array) -> jax.Array:
    return T[..., 4:7]


def se3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    q = quat_mul(se3_rot(a), se3_rot(b))
    t = quat_rotate(se3_rot(a), se3_trans(b)) + se3_trans(a)
    return se3(q, t)


def se3_inv(T: jax.Array) -> jax.Array:
    qi = quat_conj(se3_rot(T))
    return se3(qi, -quat_rotate(qi, se3_trans(T)))


def se3_apply(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 7) SE3 to (..., 3) points (broadcasting)."""
    return quat_rotate(se3_rot(T), pts) + se3_trans(T)


def se3_exp(tau: jax.Array) -> jax.Array:
    """Tangent ``[rho, omega]`` (..., 6) → SE3 (..., 7)."""
    rho, w = tau[..., :3], tau[..., 3:]
    q = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), rho)
    return se3(q, t)


def se3_log(T: jax.Array) -> jax.Array:
    w = so3_log(se3_rot(T))
    rho = jnp.einsum("...ij,...j->...i", so3_inv_left_jacobian(w), se3_trans(T))
    return jnp.concatenate([rho, w], axis=-1)


def se3_to_matrix(T: jax.Array) -> jax.Array:
    """(..., 7) → (..., 4, 4) homogeneous matrix."""
    R = quat_to_matrix(se3_rot(T))
    t = se3_trans(T)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M: jax.Array) -> jax.Array:
    return se3(matrix_to_quat(M[..., :3, :3]), M[..., :3, 3])


def se3_normalize(T: jax.Array) -> jax.Array:
    return se3(quat_normalize(se3_rot(T)), se3_trans(T))


# ---------------------------------------------------------------------------
# Sim3
# ---------------------------------------------------------------------------

def sim3_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0, 1.0], dtype=dtype)


def sim3(q: jax.Array, t: jax.Array, s: jax.Array) -> jax.Array:
    s = jnp.broadcast_to(jnp.asarray(s, dtype=t.dtype), t.shape[:-1])
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_parts(S: jax.Array):
    return S[..., :4], S[..., 4:7], S[..., 7]


def sim3_from_se3(T: jax.Array) -> jax.Array:
    s = jnp.ones(T.shape[:-1] + (1,), dtype=T.dtype)
    return jnp.concatenate([T, s], axis=-1)


def sim3_to_se3(S: jax.Array) -> jax.Array:
    """Drop the scale (used when applying a Sim3 correction to SE3 poses:
    reference ``LoopClosing.cc`` ``CorrectLoop`` divides translation by scale)."""
    q, t, s = sim3_parts(S)
    return se3(q, t / s[..., None])


def sim3_apply(S: jax.Array, pts: jax.Array) -> jax.Array:
    q, t, s = sim3_parts(S)
    return s[..., None] * quat_rotate(q, pts) + t


def sim3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    qa, ta, sa = sim3_parts(a)
    qb, tb, sb = sim3_parts(b)
    q = quat_mul(qa, qb)
    t = sa[..., None] * quat_rotate(qa, tb) + ta
    s = sa * sb
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_inv(S: jax.Array) -> jax.Array:
    q, t, s = sim3_parts(S)
    qi = quat_conj(q)
    si = 1.0 / s
    ti = -si[..., None] * quat_rotate(qi, t)
    return jnp.concatenate([qi, ti, si[..., None]], axis=-1)


def _sim3_W(w: jax.Array, sigma: jax.Array) -> jax.Array:
    """The Sim3 'W' matrix such that t = W @ rho (Ethan Eade's notes, §5.3).

    W = A I + B Ω + C Ω², with coefficients depending on (θ, σ).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    sigma = jnp.asarray(sigma)
    s = jnp.exp(sigma)
    omega = so3_hat(w)
    omega2 = omega @ omega

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta_sq < _EPS

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sig_sq = sigma * sigma
    denom = sig_sq + theta_sq

    # A-coefficient: (s−1)/σ ; σ→0: 1 + σ/2
    A = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sig_sq / 6.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))

    # a = (s sin θ)/θ stuff — follow Eade: with σ→0 and θ→0 limits.
    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    safe_theta_sq = jnp.where(small_theta, 1.0, theta_sq)
    safe_denom = jnp.where(denom < 1e-12, 1.0, denom)

    # B-coefficient (multiplies Ω):
    #   B = (σ·a/θ + (1 − b)) / (σ² + θ²)  with a = s sin θ, b = s cos θ  — general
    a_ = s * sin_t
    b_ = s * cos_t
    B_gen = ((sigma * a_ / theta) + (1.0 - b_)) / safe_denom
    # θ→0 limit: B = σ≠0 ? (σ(s−1) − (s − 1 − σ s) ... use series: B ≈ (1/2) C2 with
    # t coefficient of Ω as θ→0:  B → (s(σ−1)+1)/σ²  (Eade eq. for small θ)
    B_theta0 = jnp.where(
        small_sigma,
        0.5 + sigma / 3.0,
        (s * (safe_sigma - 1.0) + 1.0) / jnp.where(small_sigma, 1.0, sig_sq),
    )
    B = jnp.where(small_theta, B_theta0, B_gen)

    # C-coefficient (multiplies Ω²):
    # C = (A − ((b−1)σ + a θ)/(σ²+θ²)) / θ²   (general)
    C_gen = (A - ((b_ - 1.0) * sigma + a_ * theta) / safe_denom) / safe_theta_sq
    # θ→0 limit: C = (s(σ²/2 − σ + 1) − 1)/σ³ ; additionally σ→0: 1/6 + σ/8.
    C_theta0 = jnp.where(
        small_sigma,
        1.0 / 6.0 + sigma / 8.0,
        _sim3_C_theta0_sigma(s, safe_sigma),
    )
    C = jnp.where(small_theta, C_theta0, C_gen)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), omega.shape)
    A_ = A[..., None, None]
    B_ = B[..., None, None]
    C_ = C[..., None, None]
    return A_ * eye + B_ * omega + C_ * omega2


def _sim3_C_theta0_sigma(s, sigma):
    """θ→0 limit of the Ω² coefficient: ((σ−2)s + σ + 2) / (2σ³) · ... —
    derived from series of the general C: C(θ→0) = (s(σ²/2 − σ + 1) − 1)/σ³."""
    return (s * (sigma * sigma / 2.0 - sigma + 1.0) - 1.0) / (sigma * sigma * sigma)


def sim3_exp(tau: jax.Array) -> jax.Array:
    """Tangent ``[rho(3), omega(3), sigma]`` (..., 7) → Sim3 (..., 8)."""
    rho, w, sigma = tau[..., :3], tau[..., 3:6], tau[..., 6]
    q = so3_exp(w)
    W = _sim3_W(w, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    s = jnp.exp(sigma)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_log(S: jax.Array) -> jax.Array:
    q, t, s = sim3_parts(S)
    w = so3_log(q)
    sigma = jnp.log(s)
    W = _sim3_W(w, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, w, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# numpy mirrors (host control path)
#
# The per-frame host logic (pose prediction, velocity update, trajectory
# logging) touches single (7,) poses; dispatching a jitted kernel + device
# download for those costs more than the math. These numpy twins keep the
# host loop allocation-free and device-free. Semantics identical to the
# jax versions above.
# ---------------------------------------------------------------------------

def np_quat_mul(q1, q2):
    import numpy as np

    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def np_quat_rotate(q, v):
    import numpy as np

    w = q[..., :1]
    u = q[..., 1:]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def np_se3_mul(T1, T2):
    import numpy as np

    q = np_quat_mul(T1[..., :4], T2[..., :4])
    t = np_quat_rotate(T1[..., :4], T2[..., 4:7]) + T1[..., 4:7]
    out = np.concatenate([q, t], axis=-1).astype(np.float32)
    return out


def np_se3_inv(T):
    import numpy as np

    q = T[..., :4] * np.asarray([1.0, -1.0, -1.0, -1.0], np.float32)
    t = -np_quat_rotate(q, T[..., 4:7])
    return np.concatenate([q, t], axis=-1).astype(np.float32)


def np_se3_centers(Tcw):
    """Camera centers Ow = −Rᵀt for (..., 7) Tcw arrays."""
    import numpy as np

    q = Tcw[..., :4] * np.asarray([1.0, -1.0, -1.0, -1.0], np.float32)
    return (-np_quat_rotate(q, Tcw[..., 4:7])).astype(np.float32)


def np_sim3_mul(S1, S2):
    """Numpy Sim3 composition for (..., 8) [q, t, s] — host-side loop/
    merge math runs on VARIABLE-length arrays; eager jnp ops would
    compile a fresh tiny executable per length (observed: ~60 s of
    0.4 s-compiles per loop event on the TPU tunnel)."""
    import numpy as np

    q = np_quat_mul(S1[..., :4], S2[..., :4])
    t = S1[..., 7:8] * np_quat_rotate(S1[..., :4], S2[..., 4:7]) + S1[..., 4:7]
    s = S1[..., 7:8] * S2[..., 7:8]
    return np.concatenate([q, t, s], axis=-1).astype(np.float32)


def np_sim3_inv(S):
    import numpy as np

    qi = S[..., :4] * np.asarray([1.0, -1.0, -1.0, -1.0], np.float32)
    si = 1.0 / S[..., 7:8]
    t = -si * np_quat_rotate(qi, S[..., 4:7])
    return np.concatenate([qi, t, si], axis=-1).astype(np.float32)


def np_sim3_apply(S, X):
    """(..., 8) ∘ (..., 3): X' = s·R·X + t."""
    return (S[..., 7:8] * np_quat_rotate(S[..., :4], X)
            + S[..., 4:7]).astype(__import__("numpy").float32)


def np_sim3_from_se3(T):
    import numpy as np

    ones = np.ones(T.shape[:-1] + (1,), np.float32)
    return np.concatenate([np.asarray(T, np.float32), ones], axis=-1)


def np_sim3_to_se3(S):
    """Drop the scale into the translation-free SE3 part (the reference's
    Sim3→SE3 writeback divides translation by scale: Tcw = [R | t/s])."""
    import numpy as np

    t = S[..., 4:7] / S[..., 7:8]
    return np.concatenate([S[..., :4], t], axis=-1).astype(np.float32)


def np_se3_apply(T, X):
    """Numpy SE3 point transform for (..., 7) ∘ (..., 3)."""
    return (np_quat_rotate(T[..., :4], X) + T[..., 4:7]).astype(
        __import__("numpy").float32)
