"""Two-view triangulation primitives.

Replaces ``GeometricTools::Triangulate`` (reference
``src/GeometricTools.cc``: DLT via SVD of the 4x4 system) and the epipolar
helpers ``GeometricTools::ComputeF12``. All functions are batched
(leading axes broadcast) and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie


def triangulate_dlt(xn1: jax.Array, xn2: jax.Array, Tc1w: jax.Array, Tc2w: jax.Array) -> jax.Array:
    """DLT triangulation of normalized bearings.

    Args:
      xn1, xn2: (..., 3) normalized (z=1) coordinates in cameras 1/2.
      Tc1w, Tc2w: (..., 7) SE3 world→camera poses.

    Returns:
      (..., 3) world points. Mirrors ``GeometricTools::Triangulate``
      (reference ``GeometricTools.cc:36-68``): build A (4x4) from
      x̂ = P X rows, SVD, last right-singular vector, dehomogenize.
    """
    P1 = lie.se3_to_matrix(Tc1w)[..., :3, :]  # (..., 3, 4)
    P2 = lie.se3_to_matrix(Tc2w)[..., :3, :]
    rows = []
    for xn, P in ((xn1, P1), (xn2, P2)):
        x, y = xn[..., 0:1], xn[..., 1:2]
        rows.append(x * P[..., 2, :] - P[..., 0, :])
        rows.append(y * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # Row normalization: eigh of AᵀA squares the condition number, which
    # is visibly lossy in f32 on TPU — unit rows keep it tame.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    # Smallest right singular vector of A == eigenvector of AᵀA with the
    # smallest eigenvalue; eigh is batched, differentiable and TPU-friendly.
    _, V = jnp.linalg.eigh(jnp.swapaxes(A, -1, -2) @ A)
    X = V[..., :, 0]  # ascending eigenvalues → first column
    w = X[..., 3]
    return X[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]


def triangulate_fast(xn1: jax.Array, xn2: jax.Array, Tc1w: jax.Array,
                     Tc2w: jax.Array) -> jax.Array:
    """Inhomogeneous DLT: fix the homogeneous coordinate w=1 and solve the
    4×3 system by closed-form 3×3 normal equations (adjugate inverse).

    The homogeneous eigh path (:func:`triangulate_dlt`) costs ~110 ms for
    a mapping-plane batch (24k 4×4 eigendecompositions); this closed form
    is ~5 ms on the same batch. Valid for FINITE points — exactly the set
    that survives the mapping plane's parallax/cheirality/reprojection
    gates (points at infinity have w→0 and are rejected by the parallax
    gate before ever being accepted). Mono two-view INIT keeps the exact
    eigh path, where conditioning matters and the batch is small."""
    P1 = lie.se3_to_matrix(Tc1w)[..., :3, :]
    P2 = lie.se3_to_matrix(Tc2w)[..., :3, :]
    rows = []
    for xn, P in ((xn1, P1), (xn2, P2)):
        x, y = xn[..., 0:1], xn[..., 1:2]
        rows.append(x * P[..., 2, :] - P[..., 0, :])
        rows.append(y * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    A3, a4 = A[..., :3], A[..., 3]
    M = jnp.swapaxes(A3, -1, -2) @ A3                       # (..., 3, 3)
    b = -jnp.einsum("...ij,...i->...j", A3, a4)
    c00 = M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1]
    c01 = M[..., 0, 2] * M[..., 2, 1] - M[..., 0, 1] * M[..., 2, 2]
    c02 = M[..., 0, 1] * M[..., 1, 2] - M[..., 0, 2] * M[..., 1, 1]
    c10 = M[..., 1, 2] * M[..., 2, 0] - M[..., 1, 0] * M[..., 2, 2]
    c11 = M[..., 0, 0] * M[..., 2, 2] - M[..., 0, 2] * M[..., 2, 0]
    c12 = M[..., 0, 2] * M[..., 1, 0] - M[..., 0, 0] * M[..., 1, 2]
    c20 = M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]
    c21 = M[..., 0, 1] * M[..., 2, 0] - M[..., 0, 0] * M[..., 2, 1]
    c22 = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    det = M[..., 0, 0] * c00 + M[..., 0, 1] * c10 + M[..., 0, 2] * c20
    inv = jnp.stack([jnp.stack([c00, c01, c02], -1),
                     jnp.stack([c10, c11, c12], -1),
                     jnp.stack([c20, c21, c22], -1)], -2)
    inv = inv / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)[..., None, None]
    return jnp.einsum("...ij,...j->...i", inv, b)


def triangulate_midpoint(xn1, xn2, Tc1w, Tc2w):
    """Closed-form midpoint triangulation (cheaper than DLT; used for
    candidate scoring). Returns (..., 3) world points."""
    Twc1 = lie.se3_inv(Tc1w)
    Twc2 = lie.se3_inv(Tc2w)
    c1 = lie.se3_trans(Twc1)
    c2 = lie.se3_trans(Twc2)
    d1 = lie.quat_rotate(lie.se3_rot(Twc1), xn1)
    d2 = lie.quat_rotate(lie.se3_rot(Twc2), xn2)
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    b = c2 - c1
    d12 = jnp.sum(d1 * d2, axis=-1)
    denom = 1.0 - d12 * d12
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t1 = (jnp.sum(b * d1, axis=-1) - jnp.sum(b * d2, axis=-1) * d12) / denom
    t2 = (jnp.sum(b * d1, axis=-1) * d12 - jnp.sum(b * d2, axis=-1)) / denom
    p1 = c1 + t1[..., None] * d1
    p2 = c2 + t2[..., None] * d2
    return 0.5 * (p1 + p2)


def parallax_cos(xn1, xn2, Tc1w, Tc2w):
    """Cosine of the ray parallax angle between the two observations —
    the acceptance gate of ``LocalMapping::CreateNewMapPoints``
    (reference ``LocalMapping.cc:388-713`` uses cosParallax < 0.9998)."""
    Twc1 = lie.se3_inv(Tc1w)
    Twc2 = lie.se3_inv(Tc2w)
    r1 = lie.quat_rotate(lie.se3_rot(Twc1), xn1)
    r2 = lie.quat_rotate(lie.se3_rot(Twc2), xn2)
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    return jnp.sum(r1 * r2, axis=-1)


def fundamental_from_poses(K1: jax.Array, K2: jax.Array, Tc1w: jax.Array, Tc2w: jax.Array) -> jax.Array:
    """F12 such that x1ᵀ F12 x2 = 0 — replaces ``GeometricTools::ComputeF12``
    used for epipolar-constrained triangulation matching."""
    T12 = lie.se3_mul(Tc1w, lie.se3_inv(Tc2w))  # camera2 → camera1
    R12 = lie.quat_to_matrix(lie.se3_rot(T12))
    t12 = lie.se3_trans(T12)
    E = lie.so3_hat(t12) @ R12
    K1inv = jnp.linalg.inv(K1)
    K2inv = jnp.linalg.inv(K2)
    return jnp.swapaxes(K1inv, -1, -2) @ E @ K2inv


def epipolar_distance_sq(F12: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Squared point-to-epipolar-line distance of uv2 against line F·uv1 —
    the gate of ``ORBmatcher::SearchForTriangulation`` (reference
    ``ORBmatcher.cc``, epipolar check uses dist² < 3.84 σ²)."""
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], axis=-1)
    line = jnp.einsum("...ij,...j->...i", jnp.swapaxes(F12, -1, -2), x1)
    num = jnp.einsum("...i,...i->...", x2, line)
    den = line[..., 0] ** 2 + line[..., 1] ** 2
    return num * num / jnp.where(den < 1e-12, 1e-12, den)


def essential_from_poses(Tc1w: jax.Array, Tc2w: jax.Array) -> jax.Array:
    """E12 on normalized bearings: x1ᵀ E12 x2 = 0 (the calibration-free
    half of :func:`fundamental_from_poses` — fisheye epipolar geometry
    lives on bearings, since image-plane epipolar *lines* are curves
    under KB8 distortion; reference ``KannalaBrandt8::epipolarConstrain``
    avoids F entirely for the same reason)."""
    T12 = lie.se3_mul(Tc1w, lie.se3_inv(Tc2w))
    R12 = lie.quat_to_matrix(lie.se3_rot(T12))
    t12 = lie.se3_trans(T12)
    return lie.so3_hat(t12) @ R12


def bearing_sampson_sq(E12: jax.Array, x1: jax.Array, x2: jax.Array,
                       f_scale: float) -> jax.Array:
    """First-order (Sampson) squared epipolar error of bearing pairs
    (..., 3), scaled by ``f_scale²`` (≈ focal length) into pixel² units so
    the pinhole chi² gates (3.84 σ²) apply unchanged."""
    Ex2 = jnp.einsum("...ij,...j->...i", E12, x2)
    Etx1 = jnp.einsum("...ji,...j->...i", E12, x1)
    num = jnp.einsum("...i,...i->...", x1, Ex2)
    den = (Ex2[..., 0] ** 2 + Ex2[..., 1] ** 2
           + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2)
    return (f_scale * f_scale) * num * num / jnp.where(den < 1e-12, 1e-12, den)
