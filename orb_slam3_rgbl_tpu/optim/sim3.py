"""Sim3 estimation: batched Horn RANSAC + GN refinement.

Replaces ``Sim3Solver`` (reference ``src/Sim3Solver.cc``: 3-point Horn
closed form inside serial RANSAC, reprojection-gated) and
``Optimizer::OptimizeSim3`` (``Optimizer.cc:2115``: g2o refinement with
bidirectional reprojection edges).

TPU formulation: all H hypotheses are evaluated simultaneously (vmapped
Horn on (H, 3) samples, dense inlier counting) — RANSAC with a fixed
hypothesis budget instead of data-dependent early exit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera


class Sim3RansacResult(NamedTuple):
    S12: jax.Array        # (8,) Sim3 mapping cam2-frame points → cam1 frame
    inliers: jax.Array    # (P,) bool
    n_inliers: jax.Array  # () int32


def _horn_sim3_3pt(p1: jax.Array, p2: jax.Array, fix_scale: bool) -> jax.Array:
    """Closed-form Sim3 from 3 correspondences (p1 ≈ S12 · p2), batched
    over leading axes. Returns (..., 8)."""
    mu1 = jnp.mean(p1, axis=-2, keepdims=True)
    mu2 = jnp.mean(p2, axis=-2, keepdims=True)
    c1 = p1 - mu1
    c2 = p2 - mu2
    C = jnp.einsum("...ni,...nj->...ij", c1, c2)  # cross-covariance (3,3)
    U, S, Vt = jnp.linalg.svd(C)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.concatenate(
        [jnp.ones_like(S[..., :2]), d[..., None]], axis=-1
    )
    R = U @ (D[..., :, None] * Vt)
    if fix_scale:
        s = jnp.ones_like(d)
    else:
        var2 = jnp.sum(c2 * c2, axis=(-2, -1))
        s = jnp.sum(S * D, axis=-1) / jnp.maximum(var2 / p2.shape[-2], 1e-12) / p2.shape[-2]
        s = jnp.maximum(s, 1e-6)
    t = mu1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu2[..., 0, :])
    q = lie.matrix_to_quat(R)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses", "fix_scale"))
def sim3_ransac(
    p1_cam: jax.Array,
    p2_cam: jax.Array,
    uv1: jax.Array,
    uv2: jax.Array,
    sigma2_1: jax.Array,
    sigma2_2: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    key: jax.Array,
    n_hypotheses: int = 256,
    fix_scale: bool = True,
) -> Sim3RansacResult:
    """Batched-hypothesis Sim3 RANSAC.

    Args:
      p1_cam, p2_cam: (P, 3) matched landmark positions in each keyframe's
        CAMERA frame (the reference transforms map points into camera
        coordinates before solving, ``Sim3Solver.cc`` ctor).
      uv1, uv2: (P, 2) the corresponding keypoint measurements.
      sigma2_1, sigma2_2: (P,) per-observation pixel variances.
      fix_scale: stereo/RGBD/RGBL mode (reference ``mbFixScale``).

    Inlier gate: squared reprojection error < 9.210·σ² in BOTH images
    (``Sim3Solver::CheckInliers`` uses chi2 0.01 with 2 DoF = 9.210).
    """
    P = p1_cam.shape[0]
    # valid-aware minimal-set sampling: the inputs are PADDED to a fixed
    # capacity tier; uniform indices would land mostly on zero rows
    # (P=256 with ~50 real pairs → <1%% usable hypotheses). argsort puts
    # valid indices first; sampling modulo the live count stays shape-static.
    order = jnp.argsort(~valid)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    r = jax.random.randint(key, (n_hypotheses, 3), 0, P)
    idx = order[jnp.mod(r, n_valid)]
    s1 = p1_cam[idx]  # (H, 3, 3)
    s2 = p2_cam[idx]
    S12 = _horn_sim3_3pt(s1, s2, fix_scale)  # (H, 8)
    S21 = lie.sim3_inv(S12)

    def proj(p):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
        return jnp.stack(
            [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy], axis=-1
        )

    # (H, P, 3) both directions
    p2_in_1 = lie.sim3_apply(S12[:, None, :], p2_cam[None])
    p1_in_2 = lie.sim3_apply(S21[:, None, :], p1_cam[None])
    e1 = jnp.sum((proj(p2_in_1) - uv1[None]) ** 2, axis=-1)
    e2 = jnp.sum((proj(p1_in_2) - uv2[None]) ** 2, axis=-1)
    inl = (e1 < 9.210 * sigma2_1[None]) & (e2 < 9.210 * sigma2_2[None]) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return Sim3RansacResult(
        S12=S12[best], inliers=inl[best], n_inliers=counts[best].astype(jnp.int32)
    )


@functools.partial(jax.jit, static_argnames=("cam", "iterations", "fix_scale"))
def optimize_sim3(
    S12_init: jax.Array,
    p1_cam: jax.Array,
    p2_cam: jax.Array,
    uv1: jax.Array,
    uv2: jax.Array,
    inv_sigma2_1: jax.Array,
    inv_sigma2_2: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    iterations: int = 10,
    fix_scale: bool = True,
):
    """GN refinement of S12 with bidirectional reprojection residuals
    (``Optimizer::OptimizeSim3`` behaviour; Huber at √10, outliers by
    chi2 > 10 as the reference). Returns (S12, inlier_mask, n_inliers)."""
    delta = jnp.sqrt(10.0)

    def residuals(S12):
        S21 = lie.sim3_inv(S12)
        p2in1 = lie.sim3_apply(S12[None], p2_cam)
        p1in2 = lie.sim3_apply(S21[None], p1_cam)

        def proj(p):
            z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
            return jnp.stack(
                [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy],
                axis=-1,
            )

        r1 = uv1 - proj(p2in1)  # (P, 2)
        r2 = uv2 - proj(p1in2)
        return r1, r2

    def step(_, carry):
        S12, _ = carry

        def r_of_tau(tau):
            if fix_scale:
                tau = tau.at[6].set(0.0)
            S = lie.sim3_mul(lie.sim3_exp(tau), S12)
            r1, r2 = residuals(S)
            return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

        tau0 = jnp.zeros(7, S12.dtype)
        r = r_of_tau(tau0)
        J = jax.jacfwd(r_of_tau)(tau0)  # (2P·2, 7)
        w1 = jnp.repeat(inv_sigma2_1 * valid, 2)
        w2 = jnp.repeat(inv_sigma2_2 * valid, 2)
        w = jnp.concatenate([w1, w2])
        # Huber
        e = jnp.abs(r) * jnp.sqrt(jnp.maximum(w, 1e-12))
        w = w * jnp.where(e > delta, delta / jnp.maximum(e, 1e-9), 1.0)
        H = J.T @ (w[:, None] * J) + 1e-6 * jnp.eye(7, dtype=S12.dtype)
        b = J.T @ (w * r)
        tau = -jnp.linalg.solve(H, b)
        if fix_scale:
            tau = tau.at[6].set(0.0)
        S_new = lie.sim3_mul(lie.sim3_exp(tau), S12)
        return S_new, r

    S12, _ = jax.lax.fori_loop(0, iterations, step, (S12_init, jnp.zeros(p1_cam.shape[0] * 4, S12_init.dtype)))
    r1, r2 = residuals(S12)
    chi1 = jnp.sum(r1 * r1, axis=-1) * inv_sigma2_1
    chi2_ = jnp.sum(r2 * r2, axis=-1) * inv_sigma2_2
    inl = valid & (chi1 < 10.0) & (chi2_ < 10.0)
    return S12, inl, jnp.sum(inl.astype(jnp.int32))
