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
    """Separable Gaussian blur with reflect-101 borders (OpenCV default)."""
    k = gaussian_kernel_1d(size, sigma)
    pad = size // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :], k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
    )[0, 0]
    return x


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
