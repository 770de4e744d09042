"""Pose recovery from scratch (relocalization).

Replaces the reference's ``MLPnPsolver`` RANSAC (``MLPnPsolver.cpp``,
used by ``Tracking::Relocalization`` at ``Tracking.cc:3690-3692``) with a
batched-hypothesis solver. Depth sensors (stereo/RGBD/RGBL) provide 3D
for the query features, so hypotheses come from closed-form 3-point rigid
alignment (camera-frame points ↔ world landmarks) — evaluated for all H
hypotheses at once; inliers are gated by reprojection error like the
reference (chi2 5.991·σ²).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera
from orb_slam3_rgbl_tpu.optim.sim3 import _horn_sim3_3pt


class PnPResult(NamedTuple):
    Tcw: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses"))
def rigid_pnp_ransac(
    p_cam: jax.Array,      # (P, 3) query-feature positions in CAMERA frame (from depth)
    X_w: jax.Array,        # (P, 3) matched landmark world positions
    uv: jax.Array,         # (P, 2) query keypoint pixels
    sigma2: jax.Array,     # (P,)
    valid: jax.Array,      # (P,) bool
    cam: PinholeCamera,
    key: jax.Array,
    n_hypotheses: int = 256,
) -> PnPResult:
    P = p_cam.shape[0]
    # valid-aware minimal-set sampling: the inputs are PADDED to a fixed
    # capacity tier; uniform indices would land mostly on zero rows
    # (P=256 with ~50 real pairs → <1%% usable hypotheses). argsort puts
    # valid indices first; sampling modulo the live count stays shape-static.
    order = jnp.argsort(~valid)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    r = jax.random.randint(key, (n_hypotheses, 3), 0, P)
    idx = order[jnp.mod(r, n_valid)]
    # Tcw candidates: p_cam ≈ T · X_w (rigid: fix_scale)
    S = _horn_sim3_3pt(p_cam[idx], X_w[idx], fix_scale=True)  # (H, 8)
    Tcw = S[:, :7]

    pc = lie.se3_apply(Tcw[:, None, :], X_w[None])            # (H, P, 3)
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    e2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = (e2 < 5.991 * sigma2[None]) & (pc[..., 2] > 0.1) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return PnPResult(
        Tcw=lie.se3_normalize(Tcw[best]),
        inliers=inl[best],
        n_inliers=counts[best].astype(jnp.int32),
    )


def _dlt_pnp_6pt(Xw: jax.Array, xn: jax.Array) -> jax.Array:
    """Minimal 6-point DLT pose: world points (6, 3) + normalized image
    coords (6, 2) → Tcw (7,). The projective 3×4 solution is clamped to
    SE3 by orthogonal Procrustes on its rotation block."""
    dtype = Xw.dtype
    ones = jnp.ones((6, 1), dtype)
    zer = jnp.zeros((6, 4), dtype)
    Xh = jnp.concatenate([Xw, ones], axis=1)                   # (6, 4)
    r1 = jnp.concatenate([Xh, zer, -xn[:, :1] * Xh], axis=1)   # (6, 12)
    r2 = jnp.concatenate([zer, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)                      # (12, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Pm = Vt[-1].reshape(3, 4)
    # sign: the majority of the minimal set must sit in front
    depths = Xh @ Pm[2]
    Pm = Pm * jnp.sign(jnp.sum(jnp.sign(depths)) + 0.5)
    Rp = Pm[:, :3]
    U, S, Vt2 = jnp.linalg.svd(Rp)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.asarray([1.0, 1.0, det], dtype)) @ Vt2
    scale = jnp.mean(S)
    t = Pm[:, 3] / jnp.maximum(scale, 1e-12)
    return lie.se3(lie.matrix_to_quat(R), t)


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses"))
def dlt_pnp_ransac(
    X_w: jax.Array,        # (P, 3) matched landmark world positions
    uv: jax.Array,         # (P, 2) query keypoint pixels
    sigma2: jax.Array,     # (P,)
    valid: jax.Array,      # (P,) bool
    cam: PinholeCamera,
    key: jax.Array,
    n_hypotheses: int = 512,
) -> PnPResult:
    """2D→3D PnP RANSAC for sensors without query depth (monocular
    relocalization — the reference's ``MLPnPsolver`` use case). Batched
    6-point DLT hypotheses scored by reprojection chi2."""
    P = X_w.shape[0]
    # valid-aware minimal-set sampling: the inputs are PADDED to a fixed
    # capacity tier; uniform indices would land mostly on zero rows
    # (P=256 with ~50 real pairs → <1%% usable hypotheses). argsort puts
    # valid indices first; sampling modulo the live count stays shape-static.
    order = jnp.argsort(~valid)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    r = jax.random.randint(key, (n_hypotheses, 6), 0, P)
    idx = order[jnp.mod(r, n_valid)]
    xn = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=1)
    Tcw = jax.vmap(_dlt_pnp_6pt)(X_w[idx], xn[idx])            # (H, 7)

    pc = lie.se3_apply(Tcw[:, None, :], X_w[None])             # (H, P, 3)
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    e2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = (e2 < 5.991 * sigma2[None]) & (pc[..., 2] > 0.05) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return PnPResult(
        Tcw=lie.se3_normalize(Tcw[best]),
        inliers=inl[best],
        n_inliers=counts[best].astype(jnp.int32),
    )
