"""Image pyramid for multi-scale ORB extraction.

Replaces ``ORBextractor::ComputePyramid`` (reference
``ORBextractor.cc:1170-1199``): 8 levels, scale factor 1.2, bilinear
downsampling, each level resized from the previous one. Level sizes are
static Python ints so every downstream kernel compiles with fixed shapes.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_sizes(height: int, width: int, n_levels: int, scale_factor: float) -> Tuple[Tuple[int, int], ...]:
    """Static (h, w) per level, matching the reference's cvRound(size/scale)."""
    sizes = []
    for l in range(n_levels):
        inv = 1.0 / (scale_factor ** l)
        sizes.append((int(round(height * inv)), int(round(width * inv))))
    return tuple(sizes)


def level_scales(n_levels: int, scale_factor: float):
    """Per-level scale and its inverse (``mvScaleFactor`` / ``mvInvScaleFactor``)."""
    return tuple(scale_factor ** l for l in range(n_levels))


def gaussian_kernel_1d(size: int = 7, sigma: float = 2.0) -> jax.Array:
    """Matches cv::GaussianBlur(7,7,σ=2) used before descriptor sampling
    (reference ``ORBextractor.cc:1135``)."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("size",))
def gaussian_blur(img: jax.Array, size: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with reflect-101 borders (OpenCV default).

    Implemented as shift-and-accumulate (2·size fused elementwise passes)
    rather than ``lax.conv`` — single-channel convs map terribly onto the
    TPU conv path, while shifted adds are pure VPU streams that XLA fuses.
    """
    k = np.asarray(
        np.exp(-((np.arange(size) - (size - 1) / 2.0) ** 2) / (2.0 * sigma * sigma))
    )
    k = (k / k.sum()).astype(np.float32)
    pad = size // 2
    H, W = img.shape

    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(size):
        out = out + k[i] * jax.lax.dynamic_slice(x, (i, 0), (H, W))
    x = jnp.pad(out, ((0, 0), (pad, pad)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(size):
        out = out + k[i] * jax.lax.dynamic_slice(x, (0, i), (H, W))
    return out


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Half-pixel-aligned bilinear resize (cv::resize INTER_LINEAR semantics)."""
    return jax.image.resize(img, out_hw, method="linear", antialias=False)


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor", "height", "width"))
def build_pyramid(
    img: jax.Array,
    height: int,
    width: int,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> List[jax.Array]:
    """Grayscale f32 image → list of n_levels images, level 0 = input.

    Like the reference, each level is resampled from the *previous* level
    (error accumulation behaviour matches; also cheaper than resampling
    level 0 every time).
    """
    sizes = level_sizes(height, width, n_levels, scale_factor)
    out = [img]
    for l in range(1, n_levels):
        out.append(resize_bilinear(out[-1], sizes[l]))
    return out
