"""Trajectory alignment and accuracy metrics.

JAX mirror of the reference evaluation tooling
(``evaluation/evaluate_ate_scale.py:50-60``: Horn closed-form alignment
with optional scale, ATE RMSE) plus the closed-form Sim3/SE3 solve that
powers ``Sim3Solver`` (reference ``src/Sim3Solver.cc``: Horn 1987
absolute-orientation inside RANSAC).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie


class Alignment(NamedTuple):
    q: jax.Array      # (4,)  rotation model→data
    t: jax.Array      # (3,)  translation
    s: jax.Array      # ()    scale
    rmse: jax.Array   # ()    post-alignment RMSE


def horn_align(
    model: jax.Array,
    data: jax.Array,
    weights: jax.Array | None = None,
    with_scale: bool = False,
) -> Alignment:
    """Closed-form least-squares s·R·model + t ≈ data (Horn / Umeyama).

    Args:
      model, data: (N, 3) corresponding points.
      weights: optional (N,) non-negative weights (masked points → 0);
        enables fixed-shape RANSAC hypothesis evaluation.
      with_scale: solve the similarity (Sim3) instead of rigid (SE3) —
        mirrors the ``--scale`` switch of ``evaluate_ate_scale.py`` and
        ``Sim3Solver``'s ``bFixScale`` flag.
    """
    if weights is None:
        weights = jnp.ones(model.shape[:-1], dtype=model.dtype)
    wsum = jnp.sum(weights) + 1e-12
    w = (weights / wsum)[..., None]
    mu_m = jnp.sum(w * model, axis=0)
    mu_d = jnp.sum(w * data, axis=0)
    mc = model - mu_m
    dc = data - mu_d
    # Cross-covariance (3x3). SVD-based rotation (Umeyama) — robust to
    # reflections via det correction.
    C = (w * dc).T @ mc
    U, S, Vt = jnp.linalg.svd(C)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=model.dtype).at[2].set(d))
    R = U @ D @ Vt
    if with_scale:
        var_m = jnp.sum(w[..., 0] * jnp.sum(mc * mc, axis=-1))
        s = jnp.sum(S * jnp.diag(D)) / (var_m + 1e-12)
    else:
        s = jnp.array(1.0, dtype=model.dtype)
    t = mu_d - s * R @ mu_m
    aligned = s * mc @ R.T + mu_d
    err = aligned - data
    rmse = jnp.sqrt(jnp.sum(w[..., 0] * jnp.sum(err * err, axis=-1)))
    return Alignment(q=lie.matrix_to_quat(R), t=t, s=s, rmse=rmse)


def ate_rmse(gt_xyz: jax.Array, est_xyz: jax.Array, with_scale: bool = False) -> jax.Array:
    """Absolute trajectory error RMSE after Horn alignment — the metric of
    ``evaluate_ate_scale.py`` and the accuracy number in BASELINE.md."""
    return horn_align(est_xyz, gt_xyz, with_scale=with_scale).rmse


def sim3_from_correspondences(p1: jax.Array, p2: jax.Array, weights=None, fix_scale: bool = False) -> jax.Array:
    """Solve S21 (Sim3, (8,)) with p2 ≈ S21 · p1 — the closed-form core of
    ``Sim3Solver::ComputeSim3`` (reference ``Sim3Solver.cc``); fix_scale
    corresponds to stereo/RGBD mode (``mbFixScale``)."""
    a = horn_align(p1, p2, weights=weights, with_scale=not fix_scale)
    return jnp.concatenate([a.q, a.t, a.s[None]], axis=-1)


def rpe_translation(gt_T: jax.Array, est_T: jax.Array, delta: int = 1) -> jax.Array:
    """Relative pose error (translation norm) over a fixed frame delta.

    KITTI-style drift metric (the reference defers to the external
    ``kitti-odom-eval``; we provide it natively). Inputs are stacked SE3
    arrays (N, 7) in world frame (Twc)."""
    T0 = est_T[:-delta]
    T1 = est_T[delta:]
    G0 = gt_T[:-delta]
    G1 = gt_T[delta:]
    rel_est = lie.se3_mul(lie.se3_inv(T0), T1)
    rel_gt = lie.se3_mul(lie.se3_inv(G0), G1)
    err = lie.se3_mul(lie.se3_inv(rel_gt), rel_est)
    return jnp.sqrt(jnp.mean(jnp.sum(lie.se3_trans(err) ** 2, axis=-1)))
