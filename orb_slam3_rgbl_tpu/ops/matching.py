"""Binary descriptor association kernels.

Replaces ``ORBmatcher`` (reference ``src/ORBmatcher.cc``, 2,076 LoC of
per-keypoint loops): Hamming distance, ratio tests, windowed projection
search, rotation-consistency histograms — all as dense masked batch ops.

TPU-native distance formulation: a 256-bit descriptor unpacks to a ±1
row vector; for packed words a XOR+popcount path exists, but the hot
path is the MXU matmul identity

    hamming(a, b) = (256 − (±1 a) · (±1 b)) / 2     (exact in f32 accum)

so an N×M distance table is one ``jnp.dot`` on the systolic array instead
of N·M·8 scalar popcounts. Masked/padded keypoints get distance 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.ops.orb import unpack_descriptors_pm1

TH_LOW = 50     # reference ORBmatcher.h TH_LOW
TH_HIGH = 100   # reference ORBmatcher.h TH_HIGH
HISTO_LENGTH = 30  # rotation-consistency histogram bins


@jax.jit
def hamming_distance_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 8) u32 × (M, 8) u32 → (N, M) int32 Hamming distances via
    XOR + population_count (VPU path; used for small M)."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@jax.jit
def hamming_distance_mxu(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 8) u32 × (M, 8) u32 → (N, M) f32 Hamming distances via the
    ±1 matmul identity (MXU path; exact integers)."""
    av = unpack_descriptors_pm1(a, jnp.bfloat16)
    bv = unpack_descriptors_pm1(b, jnp.bfloat16)
    dot = jnp.dot(av, bv.T, preferred_element_type=jnp.float32)
    return (256.0 - dot) * 0.5


def distance_table(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
) -> jax.Array:
    """Full masked distance table (N, M) f32; invalid rows/cols → 256."""
    d = hamming_distance_mxu(desc_a, desc_b)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, 256.0)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, 256.0)
    return d


@functools.partial(jax.jit, static_argnames=("th", "ratio", "check_rotation"))
def mutual_best_match(
    dist: jax.Array,
    angles_a: jax.Array | None = None,
    angles_b: jax.Array | None = None,
    th: float = TH_LOW,
    ratio: float = 0.9,
    check_rotation: bool = True,
):
    """Best-match selection with Lowe ratio + mutual consistency +
    rotation histogram — the common core of every ``ORBmatcher::Search*``
    strategy (ratio test at reference ``ORBmatcher.cc`` SearchByBoW;
    rotation check ``ComputeThreeMaxima``).

    Args:
      dist: (N, M) distance table (256 = invalid).

    Returns:
      (match_idx (N,) int32 — index into b or −1, match_dist (N,) f32).
    """
    best_j = jnp.argmin(dist, axis=1)
    n = dist.shape[0]
    rows = jnp.arange(n)
    best_d = dist[rows, best_j]
    # second best for ratio test
    d2 = dist.at[rows, best_j].set(256.0)
    second_d = jnp.min(d2, axis=1)
    ok = (best_d <= th) & (best_d < ratio * second_d)

    # mutual check: a's best j must have a as its best i
    best_i_of_b = jnp.argmin(dist, axis=0)  # (M,)
    ok &= best_i_of_b[best_j] == rows

    if check_rotation and angles_a is not None and angles_b is not None:
        rot = angles_a - angles_b[best_j]
        two_pi = 2.0 * jnp.pi
        rot = jnp.mod(rot, two_pi)
        bin_idx = jnp.clip((rot * HISTO_LENGTH / two_pi).astype(jnp.int32), 0, HISTO_LENGTH - 1)
        hist = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bin_idx].add(ok.astype(jnp.int32))
        top3 = jax.lax.top_k(hist, 3)[0]
        # reference keeps bins within 10% of the max bin only if also in top-3
        keep_bin = hist >= jnp.maximum(top3[2], 1)
        thresh = jnp.int32(0.1 * jnp.max(hist))
        keep_bin &= hist > thresh
        ok &= keep_bin[bin_idx]

    return jnp.where(ok, best_j, -1).astype(jnp.int32), best_d


@functools.partial(jax.jit, static_argnames=("th",))
def windowed_projection_match(
    proj_uv: jax.Array,
    proj_valid: jax.Array,
    proj_desc: jax.Array,
    proj_octave: jax.Array,
    kp_uv: jax.Array,
    kp_valid: jax.Array,
    kp_desc: jax.Array,
    kp_octave: jax.Array,
    radius: jax.Array,
    th: float = TH_HIGH,
    proj_angle: jax.Array | None = None,
    kp_angle: jax.Array | None = None,
):
    """Project-and-search association: for each projected map point find
    the best keypoint within its search window and scale band.

    Dense reformulation of ``ORBmatcher::SearchByProjection`` (track-last-
    frame / track-local-map overloads): the (P, K) distance table is
    masked by the window |uv_kp − uv_proj| ≤ radius·scale and the octave
    band [octave−1, octave+1] before row-argmin.

    Args:
      proj_uv: (P, 2) predicted pixel positions of map points.
      radius: (P,) per-point window radius in pixels (already scaled).

    Returns:
      (match_idx (P,) int32 into keypoints or −1, match_dist (P,)).
    """
    d = distance_table(proj_desc, kp_desc, proj_valid, kp_valid)
    du = kp_uv[None, :, 0] - proj_uv[:, None, 0]
    dv = kp_uv[None, :, 1] - proj_uv[:, None, 1]
    inside = (jnp.abs(du) <= radius[:, None]) & (jnp.abs(dv) <= radius[:, None])
    band = (kp_octave[None, :] >= proj_octave[:, None] - 1) & (
        kp_octave[None, :] <= proj_octave[:, None] + 1
    )
    d = jnp.where(inside & band, d, 256.0)
    best_j = jnp.argmin(d, axis=1)
    best_d = d[jnp.arange(d.shape[0]), best_j]
    ok = best_d <= th
    if proj_angle is not None and kp_angle is not None:
        # rotation-consistency histogram over accepted matches (reference
        # mbCheckOrientation / ComputeThreeMaxima in SearchByProjection
        # (Frame, LastFrame) — projections carrying a source keypoint
        # orientation, e.g. last-frame features, get the same gating)
        rot = jnp.mod(proj_angle - kp_angle[best_j], 2.0 * jnp.pi)
        bin_idx = jnp.clip((rot * HISTO_LENGTH / (2.0 * jnp.pi)).astype(jnp.int32),
                           0, HISTO_LENGTH - 1)
        hist = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bin_idx].add(ok.astype(jnp.int32))
        top3 = jax.lax.top_k(hist, 3)[0]
        keep_bin = (hist >= jnp.maximum(top3[2], 1)) & (hist > jnp.int32(0.1 * jnp.max(hist)))
        ok &= keep_bin[bin_idx]
    return jnp.where(ok, best_j, -1).astype(jnp.int32), best_d


@functools.partial(jax.jit, static_argnames=("th", "n_rows"))
def stereo_row_match(
    desc_l: jax.Array,
    v_l: jax.Array,
    valid_l: jax.Array,
    octave_l: jax.Array,
    desc_r: jax.Array,
    u_r: jax.Array,
    v_r: jax.Array,
    valid_r: jax.Array,
    octave_r: jax.Array,
    min_disp: float,
    max_disp: float,
    u_l: jax.Array,
    scale_factors: jax.Array,
    th: float = TH_HIGH,
    n_rows: int = 376,
):
    """Row-banded stereo matching (replaces ``Frame::ComputeStereoMatches``
    reference ``Frame.cc:901-1072``).

    Right keypoints within ±2·scale rows of the left keypoint's row and
    with disparity in [min_disp, max_disp] are candidates; best Hamming
    match wins. (The reference's SAD subpixel refinement is deferred to a
    Pallas kernel; integer-pixel disparity already bounds error < 1 px.)

    Returns (u_right (N,) f32 or −1, depth-ready disparity (N,) f32).
    """
    d = distance_table(desc_l, desc_r, valid_l, valid_r)
    row_tol = 2.0 * scale_factors[jnp.clip(octave_r, 0, scale_factors.shape[0] - 1)]
    row_ok = jnp.abs(v_l[:, None] - v_r[None, :]) <= row_tol[None, :]
    disp = u_l[:, None] - u_r[None, :]
    disp_ok = (disp >= min_disp) & (disp <= max_disp)
    d = jnp.where(row_ok & disp_ok, d, 256.0)
    best_j = jnp.argmin(d, axis=1)
    rows = jnp.arange(d.shape[0])
    best_d = d[rows, best_j]
    ok = best_d <= th
    u_right = jnp.where(ok, u_r[best_j], -1.0)
    return u_right, best_d
