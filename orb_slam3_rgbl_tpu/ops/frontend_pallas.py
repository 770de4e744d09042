"""Fused dense frontend (FAST-9/16 score + Gaussian blur) as one Pallas
TPU kernel per pyramid level.

The XLA formulation materializes a (16, H, W) circle-neighbor stack plus
several reduction intermediates in HBM (~150 MB of traffic on a KITTI
level-0 frame) for what is arithmetically a single streaming pass. Here
each grid step holds a (BAND, CBAND) tile of the level in VMEM (the
padded image stays resident; reads overlap by a halo) and computes BOTH
outputs from the same registers:

* FAST score — 16 statically-shifted contrasts, per-arc min/max over the
  9-long circular windows (identical math to ``fast.fast_score``,
  reference ``ORBextractor.cc:781-896`` / cv::FAST cornerScore). Arcs
  are evaluated directly (not log-depth) to keep the number of live
  tile-sized values small — VMEM, not FLOPs, is the binding constraint.
* 7×7 σ=2 Gaussian blur — separable shift-and-accumulate (identical to
  ``pyramid.gaussian_blur``; the reference blurs before descriptor
  sampling, ``ORBextractor.cc:1135``).

Borders use reflect-101 padding, bit-identical to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_rgbl_tpu.ops.fast import CIRCLE_OFFSETS, ARC_LEN

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

BAND = 64      # output rows per grid step (multiple of 8)
CBAND = 256    # output cols per grid step (multiple of 128)
HALO = 8       # row padding above/below (≥ 3, 8-aligned)
CHALO = 64     # col padding left (≥ 3; left + right = 128-aligned total)

_GAUSS = None


def _gauss_taps():
    global _GAUSS
    if _GAUSS is None:
        k = np.exp(-((np.arange(7) - 3.0) ** 2) / (2.0 * 2.0 * 2.0))
        _GAUSS = (k / k.sum()).astype(np.float32)
    return _GAUSS


def _frontend_kernel(img_ref, score_ref, blur_ref):
    """img_ref: (H + 2·HALO, W + 128·k) f32 VMEM (reflect-101 padded);
    per-step outputs: (BAND, CBAND) blocks of score and blur."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    # aligned tile read covering the output block + (3, 3) halos:
    # output pixel (r, c) lives at padded (r + HALO, c + CHALO)
    tile = img_ref[
        pl.ds(i * BAND, BAND + 2 * HALO),
        pl.ds(j * CBAND, CBAND + 128),
    ]

    def shifted(dy, dx):
        return jax.lax.slice(
            tile, (HALO + dy, CHALO + dx),
            (HALO + dy + BAND, CHALO + dx + CBAND),
        )

    center = shifted(0, 0)
    d = [shifted(int(dy), int(dx)) - center for dy, dx in CIRCLE_OFFSETS]

    # direct per-arc evaluation: arc a = min/max of d[a..a+8]; track the
    # best over arcs incrementally (≤ ~20 live tiles at any point)
    bright = None
    dark = None
    for a in range(16):
        mn = d[a]
        mx = d[a]
        for t in range(1, ARC_LEN):
            mn = jnp.minimum(mn, d[(a + t) % 16])
            mx = jnp.maximum(mx, d[(a + t) % 16])
        bright = mn if bright is None else jnp.maximum(bright, mn)
        dark = mx if dark is None else jnp.minimum(dark, mx)
    score_ref[:] = jnp.maximum(jnp.maximum(bright, -dark), 0.0)

    # separable 7-tap blur from the same tile
    taps = _gauss_taps()
    W_t = tile.shape[1]
    rowacc = taps[0] * jax.lax.slice(tile, (HALO - 3, 0), (HALO - 3 + BAND, W_t))
    for t in range(1, 7):
        rowacc = rowacc + taps[t] * jax.lax.slice(
            tile, (HALO - 3 + t, 0), (HALO - 3 + t + BAND, W_t)
        )
    blur = taps[0] * jax.lax.slice(rowacc, (0, CHALO - 3), (BAND, CHALO - 3 + CBAND))
    for t in range(1, 7):
        blur = blur + taps[t] * jax.lax.slice(
            rowacc, (0, CHALO - 3 + t), (BAND, CHALO - 3 + t + CBAND)
        )
    blur_ref[:] = blur


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_and_blur(img: jax.Array, interpret: bool = False):
    """(H, W) f32 level image → (score (H, W), blurred (H, W)).

    Bit-identical to ``fast.fast_score`` + ``pyramid.gaussian_blur``.
    """
    H, W = img.shape
    Hb = ((H + BAND - 1) // BAND) * BAND
    Wb = ((W + CBAND - 1) // CBAND) * CBAND
    # reflect-101 halo first (semantics), then zeros to the aligned grid
    # extent (those regions are cropped away)
    padded = jnp.pad(img, ((HALO, HALO), (CHALO, CHALO)), mode="reflect")
    padded = jnp.pad(
        padded,
        ((0, Hb - H), (0, (Wb + 128) - padded.shape[1])),
    )
    score, blur = pl.pallas_call(
        _frontend_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Hb, Wb), jnp.float32),
            jax.ShapeDtypeStruct((Hb, Wb), jnp.float32),
        ),
        grid=(Hb // BAND, Wb // CBAND),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((BAND, CBAND), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BAND, CBAND), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(padded)
    score = score[:H, :W]
    blur = blur[:H, :W]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(border, score, 0.0), blur
