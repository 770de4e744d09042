"""Steered-BRIEF descriptor extraction as a Pallas TPU kernel.

The baseline XLA formulation (``orb.brief_descriptors``) samples the
image at 2·256 rotated pattern points per keypoint — ~2M random gathers
per frame, which sit on the TPU's ~15 ns/element gather floor (~10 ms,
dominating the whole frontend; reference hot path
``ORBextractor::computeDescriptors``, ``ORBextractor.cc:122-407``).

TPU-native reformulation (this module):

* **Rotation is quantized to ``NB = 30`` angle bins** (12° steps — the
  rBRIEF design from the original ORB paper; the reference/OpenCV uses
  continuous angles, an implementation convenience on CPUs where the
  512 scalar reads are cheap). Each bin has a static table of rotated
  pattern positions inside the 32×32 patch.
* **Keypoints are sorted into bin-pure blocks of ``BLK = 64``** (host
  side, static shapes) so one selection table serves a whole block.
* The kernel keeps the (composite, all-pyramid-levels) image resident
  in VMEM, slices each keypoint's 40×40 patch with a dynamic vector
  read (no gather), and selects the 512 pattern samples with a single
  **one-hot MXU matmul** per block: ``patches @ onehot`` (separable row/col one-hots). Intensities are pre-rounded to integers, so bf16
  one-hot selection is bit-exact (ints ≤ 256 are exact in bf16; the
  reference compares blurred *uchar* values, so rounding is faithful).
* Bit packing is a VPU shift/or over the comparison mask.

A pure-jnp reference with identical semantics (``brief_binned_ref``)
runs on CPU (tests, non-TPU backends) and validates the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_rgbl_tpu.ops.orb import PATTERN_A, PATTERN_B

try:  # pallas imports fail gracefully on backends without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

NB = 30          # angle bins (2π/30 = 12°, ORB-paper rBRIEF quantization)
BLK = 64         # keypoints per kernel block (MXU M-dim)
# rotated pattern offsets round to at most ±18 (pattern radius ≤ 18.4);
# the patch must cover [-18, 18] plus alignment slack
HALF = 18        # pattern center offset inside the patch
PATCH = 40       # patch side (≥ 2·HALF+1, lanes-friendly)


@functools.lru_cache(maxsize=None)
def binned_pattern_tables():
    """(NB, 512) int32 — linearized PATCH×PATCH-patch position of each
    rotated pattern point (A points then B points) per angle bin."""
    # f32 rotation arithmetic mirrors the continuous path bit-for-bit at
    # bin centers (round-half-even on the same f32 products)
    pa, pb = np.asarray(PATTERN_A, np.float32), np.asarray(PATTERN_B, np.float32)
    out = np.zeros((NB, 512), np.int32)
    for b in range(NB):
        a = np.float32((b + 0.5) * 2.0 * np.pi / NB - np.pi)
        ca, sa = np.cos(a, dtype=np.float32), np.sin(a, dtype=np.float32)
        for off, p in ((0, pa), (256, pb)):
            x = np.round(p[:, 0] * ca - p[:, 1] * sa).astype(np.int32)
            y = np.round(p[:, 0] * sa + p[:, 1] * ca).astype(np.int32)
            assert np.abs(x).max() <= HALF and np.abs(y).max() <= HALF
            out[b, off:off + 256] = (y + HALF) * PATCH + (x + HALF)
    return out


def angle_bins(angle: jax.Array) -> jax.Array:
    """Radians in [-π, π) → bin id in [0, NB)."""
    b = jnp.floor((angle + jnp.pi) * (NB / (2.0 * jnp.pi))).astype(jnp.int32)
    return jnp.clip(b, 0, NB - 1)


def _pack_bits(bits01: jax.Array) -> jax.Array:
    """(..., 256) {0,1} → (..., 8) packed u32 words.

    Packing runs in int32 (Mosaic has no unsigned reductions): summing
    distinct powers of two wraps exactly in two's complement, so the
    final bitcast to uint32 is bit-exact."""
    words = bits01.astype(jnp.int32).reshape(*bits01.shape[:-1], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.int32)
    packed = jnp.sum(words << shifts, axis=-1, dtype=jnp.int32)
    return jax.lax.bitcast_convert_type(packed, jnp.uint32)


def _pack_bits_kernel(bits01: jax.Array) -> jax.Array:
    """(BLK, 256) {0,1} → (BLK, 8) u32, reshape-free (in-kernel; Mosaic
    rejects the (BLK, 256) → (BLK, 8, 32) relayout): per-word lane-masked
    shift/or accumulation."""
    bits = bits01.astype(jnp.int32)
    n = bits.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 8), 1)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (n, 32), 1)
    packed = jnp.zeros((n, 8), jnp.int32)
    for w in range(8):
        word = jnp.sum(bits[:, w * 32:(w + 1) * 32] << shifts, axis=1,
                       keepdims=True, dtype=jnp.int32)
        packed = packed | jnp.where(lane == w, word, 0)
    return jax.lax.bitcast_convert_type(packed, jnp.uint32)


def brief_binned_ref(img: jax.Array, uv: jax.Array, angle: jax.Array) -> jax.Array:
    """Pure-jnp reference of the binned-BRIEF semantics (gather-based;
    used on CPU and to validate the kernel). ``img`` must already be
    rounded to integer intensities."""
    H, W = img.shape
    tab = jnp.asarray(binned_pattern_tables())            # (NB, 512)
    idx = tab[angle_bins(angle)]                           # (N, 512)
    dy = idx // PATCH - HALF
    dx = idx % PATCH - HALF
    yy = jnp.clip(uv[:, 1:2] + dy, 0, H - 1)
    xx = jnp.clip(uv[:, 0:1] + dx, 0, W - 1)
    vals = img[yy, xx]                                     # (N, 512)
    return _pack_bits(vals[:, :256] < vals[:, 256:])


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

TROWS = PATCH + 8  # stored rows per keypoint (8-aligned load, 8 slack)


def _brief_kernel(uvb_ref, bbin_ref, rem_ref, img_ref, tab_ref, out_ref, patches):
    """One bin-pure block of BLK keypoints.

    uvb_ref:  (BLK, 2) i32 SMEM — aligned patch-corner coords
              (u−15, 8-aligned v) per slot
    bbin_ref: (n_blocks, 1) i32 SMEM — angle bin per block
    rem_ref:  (BLK, 8) i32 VMEM — row remainder (v−15) − v_aligned,
              broadcast along the last axis
    img_ref:  (Hc, Wc) f32 VMEM — composite pyramid image (rounded
              integer intensities; rolls require 32-bit data)
    tab_ref:  (NB, 512) i32 VMEM — rotated-pattern position tables
    out_ref:  (BLK, 8) u32 VMEM
    patches:  (BLK·TROWS, PATCH) f32 VMEM scratch — keypoint k's rows
              at [k·TROWS, (k+1)·TROWS)

    The (r, c) one-hot of a pattern position is separable —
    oh[r, c, j] = R[r, j]·C[c, j] — so sampling becomes ONE MXU matmul
    over columns, T = patches @ C, then a masked row reduction with R.
    Hardware cannot dynamically roll the sublane axis, so the row
    alignment remainder is folded into R per keypoint instead (the lane
    axis does support dynamic rolls). Intensities are integers and the
    one-hots exact in bf16 ⇒ selected values are bit-exact.
    """
    def load_one(k, carry):
        u0 = uvb_ref[k, 0]
        v_al = uvb_ref[k, 1]
        u_al = (u0 // 128) * 128
        tile = img_ref[
            pl.ds(pl.multiple_of(v_al, 8), TROWS),
            pl.ds(pl.multiple_of(u_al, 128), 256),
        ]
        tile = pltpu.roll(tile, -(u0 - u_al), 1)
        patches[pl.ds(k * TROWS, TROWS), :] = tile[:, :PATCH]
        return carry

    jax.lax.fori_loop(0, BLK, load_one, 0)

    b = bbin_ref[pl.program_id(0), 0]
    idx_row = tab_ref[pl.ds(b, 1), :]                       # (1, 512)
    row_id = idx_row // PATCH                               # (1, 512)
    col_id = idx_row % PATCH

    cpos = jax.lax.broadcasted_iota(jnp.int32, (PATCH, 512), 0)
    C = (cpos == col_id).astype(jnp.bfloat16)               # (PATCH, 512)
    # values are small ints: bf16 operands are exact; acc must be f32
    T = jnp.dot(patches[:].astype(jnp.bfloat16), C,
                preferred_element_type=jnp.float32)         # (BLK·TROWS, 512)
    T3 = T.reshape(BLK, TROWS, 512)                         # leading split
    rpos = jax.lax.broadcasted_iota(jnp.int32, (BLK, TROWS, 512), 1)
    rem = rem_ref[:, 0:1][:, :, None]                       # (BLK, 1, 1)
    R = (rpos == row_id[:, None, :] + rem).astype(jnp.float32)
    vals = jnp.sum(T3 * R, axis=1, dtype=jnp.float32)       # (BLK, 512)

    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.int32)  # (BLK, 256)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLK, 8), 1)
    packed = jnp.zeros((BLK, 8), jnp.int32)
    for w in range(8):
        chunk = bits[:, w * 32:(w + 1) * 32]                   # (BLK, 32)
        shifts = jax.lax.broadcasted_iota(jnp.int32, (BLK, 32), 1)
        word = jnp.sum(chunk << shifts, axis=1, keepdims=True, dtype=jnp.int32)
        packed = packed | jnp.where(lane == w, word, 0)
    out_ref[:] = jax.lax.bitcast_convert_type(packed, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_blocks_pallas(img_comp: jax.Array, corners: jax.Array,
                        block_bins: jax.Array, interpret: bool = False) -> jax.Array:
    """Run the kernel over S = corners.shape[0] bin-pure slots.

    img_comp: (Hc, Wc) bf16, intensities pre-rounded to integers
      (small ints are exact in bf16).
    corners:  (S, 2) i32 patch corners (u−15, v−15), slot-ordered.
    block_bins: (S // BLK, 1) i32 bin per block.
    Returns (S, 8) u32 descriptors (padding slots hold garbage).
    """
    S = corners.shape[0]
    assert S % BLK == 0
    n_blocks = S // BLK
    img_comp = img_comp.astype(jnp.float32)
    tab = jnp.asarray(binned_pattern_tables())
    v_al = (corners[:, 1] // 8) * 8
    uvb = jnp.stack([corners[:, 0], v_al], axis=1)
    rem = jnp.broadcast_to((corners[:, 1] - v_al)[:, None], (S, 8)).astype(jnp.int32)
    return pl.pallas_call(
        _brief_kernel,
        out_shape=jax.ShapeDtypeStruct((S, 8), jnp.uint32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLK, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # all block bins
            pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full image, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pattern tables
        ],
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLK * TROWS, PATCH), jnp.float32)],
        interpret=interpret,
    )(uvb, block_bins, rem, img_comp, tab)


# ---------------------------------------------------------------------------
# Host-side orchestration: composite image + bin-pure slot layout
# ---------------------------------------------------------------------------

def slot_capacity(n_total: int) -> int:
    """Static slot count: every bin may waste up to BLK−1 slots."""
    cap = n_total + NB * (BLK - 1)
    return ((cap + BLK - 1) // BLK) * BLK


def bin_pure_layout(bins: jax.Array, S: int):
    """Assign each keypoint a slot such that every BLK-slot block holds
    keypoints of a single bin. All shapes static.

    Returns (slots (N,) i32, block_bins (S//BLK, 1) i32).
    """
    N = bins.shape[0]
    counts = jnp.bincount(bins, length=NB)
    padded = ((counts + BLK - 1) // BLK) * BLK
    base = jnp.concatenate([jnp.zeros(1, padded.dtype), jnp.cumsum(padded)[:-1]])
    start = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    order = jnp.argsort(bins, stable=True)
    sorted_bins = bins[order]
    rank = jnp.arange(N, dtype=jnp.int32) - start[sorted_bins].astype(jnp.int32)
    slot_sorted = base[sorted_bins].astype(jnp.int32) + rank
    slots = jnp.zeros(N, jnp.int32).at[order].set(slot_sorted)
    block_starts = jnp.arange(S // BLK, dtype=jnp.int32) * BLK
    ends = jnp.cumsum(padded)
    block_bins = jnp.clip(
        jnp.searchsorted(ends, block_starts, side="right"), 0, NB - 1
    ).astype(jnp.int32)
    return slots, block_bins.reshape(-1, 1)


def descriptors_multilevel(levels_blurred, uv_list, ang_list,
                           use_pallas: bool | None = None,
                           interpret: bool = False,
                           mode: str = "continuous"):
    """BRIEF descriptors across all pyramid levels in ONE kernel launch
    (TPU) or one reference pass (CPU).

    levels_blurred: list of (H_l, W_l) f32 blurred level images.
    uv_list: list of (N_l, 2) i32 level-local keypoint coords (margin
      ≥ 19 from the level border, as produced by ``select_keypoints``).
    ang_list: list of (N_l,) f32 angles.
    mode: 'continuous' — per-keypoint rotation, bit-exact equal to
      ``orb.brief_descriptors`` / the reference GET_VALUE arithmetic
      (default); 'binned' — NB-bin quantized rotation (ORB-paper rBRIEF;
      slightly cheaper: shared selection tables per block).
    Returns list of (N_l, 8) u32 descriptor arrays.
    """
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() == "tpu"

    # composite: levels stacked vertically, padded to the widest level
    # (+ alignment slack so the kernel's tile-aligned loads stay in
    # bounds: lanes to a 128-multiple + 128, rows to an 8-multiple + 8)
    W_img = max(im.shape[1] for im in levels_blurred)
    W0 = ((W_img + 127) // 128) * 128 + 128
    offs = []
    row = 0
    for im in levels_blurred:
        offs.append(row)
        row += im.shape[0]
    Hc = ((row + 7) // 8) * 8 + 16
    comp = jnp.zeros((Hc, W0), jnp.float32)
    for im, off in zip(levels_blurred, offs):
        comp = jax.lax.dynamic_update_slice(jnp.asarray(comp), jnp.round(im), (off, 0))

    uv_all = jnp.concatenate([
        jnp.stack([uv[:, 0], uv[:, 1] + off], axis=1)
        for uv, off in zip(uv_list, offs)
    ])
    ang_all = jnp.concatenate([jnp.asarray(a) for a in ang_list])
    n_per = [uv.shape[0] for uv in uv_list]
    N = int(sum(n_per))

    # patch corners, clamped so the kernel's aligned loads stay in
    # bounds: lanes need (u0//128)·128 + 256 ≤ W0, rows need
    # (v0//8)·8 + TROWS ≤ Hc (the composite's alignment slack
    # guarantees real corners never hit these clips)
    corner_hi = jnp.asarray([W0 - 160, Hc - TROWS], jnp.int32)
    if not use_pallas:
        from orb_slam3_rgbl_tpu.ops import orb as _orb

        if mode == "continuous":
            desc_all = _orb.brief_descriptors(comp, uv_all.astype(jnp.int32), ang_all)
        else:
            desc_all = brief_binned_ref(comp, uv_all.astype(jnp.int32), ang_all)
    elif mode == "continuous":
        S = ((N + BLK - 1) // BLK) * BLK
        corners = jnp.clip(uv_all.astype(jnp.int32) - HALF, 0, corner_hi)
        uvb = jnp.ones((S, 2), jnp.int32).at[:N].set(corners)
        idx = jnp.zeros((S, 512), jnp.int32).at[:N].set(
            continuous_index_tables(ang_all)
        )
        desc_all = brief_continuous_pallas(comp, uvb, idx,
                                           interpret=interpret)[:N]
    else:
        S = slot_capacity(N)
        bins = angle_bins(ang_all)
        slots, block_bins = bin_pure_layout(bins, S)
        corners = jnp.clip(uv_all.astype(jnp.int32) - HALF, 0, corner_hi)
        uvb = jnp.ones((S, 2), jnp.int32)
        uvb = uvb.at[slots].set(corners)
        desc_slots = brief_blocks_pallas(comp, uvb, block_bins,
                                         interpret=interpret)
        desc_all = desc_slots[slots]

    out = []
    o = 0
    for n in n_per:
        out.append(desc_all[o:o + n])
        o += n
    return out


# ---------------------------------------------------------------------------
# Continuous-rotation kernel (exact reference semantics, no angle bins)
# ---------------------------------------------------------------------------

def continuous_index_tables(angle: jax.Array) -> jax.Array:
    """(N,) angles → (N, 512) int32 patch positions with per-keypoint
    continuous rotation — the same f32 round(cos/sin) arithmetic as
    ``orb.brief_descriptors`` (≡ reference GET_VALUE,
    ``ORBextractor.cc:122-147``), so descriptors are bit-exact equal."""
    pa = jnp.asarray(PATTERN_A, jnp.float32)
    pb = jnp.asarray(PATTERN_B, jnp.float32)
    P = jnp.concatenate([pa, pb], axis=0)                  # (512, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    x = jnp.round(P[None, :, 0] * ca[:, None] - P[None, :, 1] * sa[:, None])
    y = jnp.round(P[None, :, 0] * sa[:, None] + P[None, :, 1] * ca[:, None])
    return ((y + HALF) * PATCH + (x + HALF)).astype(jnp.int32)


def _brief_kernel_cont(uvb_ref, rem_ref, idx_ref, img_ref, out_ref,
                       patches2, vals_scr):
    """One block of BLK keypoints, per-keypoint rotation tables.

    uvb_ref:  (BLK, 2) i32 SMEM — (u corner, 8-aligned v corner)
    rem_ref:  (BLK, 8) i32 SMEM — v-alignment remainder
    idx_ref:  (BLK, 512) i32 VMEM — per-keypoint pattern positions
    img_ref:  (Hc, Wc) f32 VMEM — composite image (rounded ints; rolls
              require 32-bit data)
    out_ref:  (BLK, 8) u32 VMEM
    patches2: (BLK·TROWS, PATCH) f32 VMEM scratch
    vals_scr: (BLK, 512) f32 VMEM scratch

    Same separable one-hot selection as the binned kernel, but with a
    per-keypoint table: the block unrolls into BLK small 2D MXU matmuls
    (static slices only — Mosaic rejects the 3D batched formulation).
    """
    def load_one(k, carry):
        u0 = uvb_ref[k, 0]
        v_al = uvb_ref[k, 1]
        u_al = (u0 // 128) * 128
        tile = img_ref[
            pl.ds(pl.multiple_of(v_al, 8), TROWS),
            pl.ds(pl.multiple_of(u_al, 128), 256),
        ]
        tile = pltpu.roll(tile, -(u0 - u_al), 1)
        patches2[pl.ds(k * TROWS, TROWS), :] = tile[:, :PATCH]
        return carry

    jax.lax.fori_loop(0, BLK, load_one, 0)

    cpos = jax.lax.broadcasted_iota(jnp.int32, (PATCH, 512), 0)
    rpos = jax.lax.broadcasted_iota(jnp.int32, (TROWS, 512), 0)
    for k in range(BLK):
        idx_k = idx_ref[k:k + 1, :]                         # (1, 512)
        C = (cpos == idx_k % PATCH).astype(jnp.bfloat16)    # (PATCH, 512)
        Tk = jnp.dot(
            patches2[k * TROWS:(k + 1) * TROWS, :].astype(jnp.bfloat16), C,
            preferred_element_type=jnp.float32,
        )                                                   # (TROWS, 512)
        Rk = (rpos == idx_k // PATCH + rem_ref[k, 0]).astype(jnp.float32)
        vals_scr[k:k + 1, :] = jnp.sum(Tk * Rk, axis=0, keepdims=True)

    vals = vals_scr[:]
    out_ref[:] = _pack_bits_kernel(vals[:, :256] < vals[:, 256:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_continuous_pallas(img_comp: jax.Array, corners: jax.Array,
                            idx_tables: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Continuous-rotation BRIEF over S slots (S = corners.shape[0],
    multiple of BLK; no bin sorting needed). Returns (S, 8) u32."""
    S = corners.shape[0]
    assert S % BLK == 0
    img_comp = img_comp.astype(jnp.float32)
    v_al = (corners[:, 1] // 8) * 8
    uvb = jnp.stack([corners[:, 0], v_al], axis=1)
    rem = jnp.broadcast_to((corners[:, 1] - v_al)[:, None], (S, 8)).astype(jnp.int32)
    return pl.pallas_call(
        _brief_kernel_cont,
        out_shape=jax.ShapeDtypeStruct((S, 8), jnp.uint32),
        grid=(S // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full image, resident
        ],
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK * TROWS, PATCH), jnp.float32),
            pltpu.VMEM((BLK, 512), jnp.float32),
        ],
        interpret=interpret,
    )(uvb, rem, idx_tables, img_comp)
