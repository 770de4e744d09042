"""ORB keypoint orientation (IC_Angle) and rotated BRIEF descriptors.

Replaces ``ORBextractor::IC_Angle`` (reference ``ORBextractor.cc:76-113``)
and ``computeOrbDescriptor`` (``:122-407``). Descriptors use the standard
published ORB 256-pair sampling pattern (``orb_pattern.npy`` — the
learned pattern from Rublee et al., ICCV 2011, as shipped in OpenCV and
the reference's ``bit_pattern_31_`` table; pure constant data).

TPU formulation: all keypoints of a level are processed as one batched
gather (N×961 patch reads, N×512 pattern reads) — no per-keypoint loops.
Descriptors are packed to (N, 8) uint32 words for popcount matching and
are also convertible to ±1 bf16 rows for MXU matmul distance.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # reference HALF_PATCH_SIZE = 15 (31×31 patch)

_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy")).astype(np.int32)
# (256, 4) → two point sets (256, 2) as (x, y)
PATTERN_A = _PATTERN[:, 0:2]
PATTERN_B = _PATTERN[:, 2:4]


def _umax_table() -> np.ndarray:
    """Circular-patch row extents for IC_Angle, symmetric construction
    (reference ctor ``ORBextractor.cc:468-487``)."""
    umax = np.zeros(HALF_PATCH + 1, dtype=np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


UMAX = _umax_table()


def _circular_mask() -> np.ndarray:
    """(31, 31) bool mask of the orientation patch — rows clipped by UMAX
    (exactly the pixels IC_Angle sums)."""
    m = np.zeros((2 * HALF_PATCH + 1, 2 * HALF_PATCH + 1), dtype=bool)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        u_lim = UMAX[abs(v)]
        for u in range(-u_lim, u_lim + 1):
            m[v + HALF_PATCH, u + HALF_PATCH] = True
    return m


CIRC_MASK = _circular_mask()


@jax.jit
def gather_patches(img: jax.Array, uv: jax.Array, half: int = HALF_PATCH) -> jax.Array:
    """(H, W), (N, 2) int → (N, 2h+1, 2h+1) patches (edge-clamped reads;
    callers keep keypoints ≥ EDGE_THRESHOLD from the border so clamping
    never triggers for valid keypoints)."""
    H, W = img.shape
    size = 2 * half + 1
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)
    yy = jnp.clip(uv[:, 1, None, None] + dy[None, :, None], 0, H - 1)
    xx = jnp.clip(uv[:, 0, None, None] + dx[None, None, :], 0, W - 1)
    return img[yy, xx]


@jax.jit
def ic_angle_gather(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Reference implementation of the intensity-centroid orientation via
    per-keypoint patch gathers (kept for testing; the production path is
    the dense-moment formulation below — TPU gathers are slow)."""
    patches = gather_patches(img, uv)  # (N, 31, 31)
    mask = jnp.asarray(CIRC_MASK, dtype=img.dtype)
    coords = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=img.dtype)
    pm = patches * mask[None]
    m10 = jnp.einsum("nij,j->n", pm, coords)
    m01 = jnp.einsum("nij,i->n", pm, coords)
    return jnp.arctan2(m01, m10)


@jax.jit
def ic_moment_maps(img: jax.Array):
    """Dense intensity-centroid moment maps (m10, m01) — each pixel holds
    the circular-patch moments of ``IC_Angle`` (reference
    ``ORBextractor.cc:76-113``).

    TPU formulation: prefix sums along x of I and x·I turn each patch
    row's interval sum into two O(1) lookups; the 31 rows accumulate with
    static shifts. Streaming VPU passes instead of N×961 random gathers.
    """
    H, W = img.shape
    dtype = img.dtype
    hp = HALF_PATCH
    xcoord = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    # prefix sums with a leading zero column: S[y, x+1] = sum img[y, :x+1]
    S = jnp.concatenate([jnp.zeros((H, 1), dtype), jnp.cumsum(img, axis=1)], axis=1)
    T = jnp.concatenate([jnp.zeros((H, 1), dtype), jnp.cumsum(img * xcoord, axis=1)], axis=1)
    # pad rows so y0+dy stays in range; row-interval [x0-u, x0+u] needs
    # S indices x0+u+1 and x0-u ⇒ pad columns by hp+1 on both sides
    Sp = jnp.pad(S, ((hp, hp), (hp, hp)))
    Tp = jnp.pad(T, ((hp, hp), (hp, hp)))

    m10 = jnp.zeros((H, W), dtype)
    m01 = jnp.zeros((H, W), dtype)
    x0 = xcoord
    for dy in range(-hp, hp + 1):
        u = int(UMAX[abs(dy)])
        # Sp[y0+dy, x0+u+1] − Sp[y0+dy, x0−u]  (offsets include the +hp pad)
        hi_s = jax.lax.dynamic_slice(Sp, (hp + dy, hp + u + 1), (H, W))
        lo_s = jax.lax.dynamic_slice(Sp, (hp + dy, hp - u), (H, W))
        hi_t = jax.lax.dynamic_slice(Tp, (hp + dy, hp + u + 1), (H, W))
        lo_t = jax.lax.dynamic_slice(Tp, (hp + dy, hp - u), (H, W))
        row_i = hi_s - lo_s
        row_xi = (hi_t - lo_t) - x0 * row_i
        m10 = m10 + row_xi
        m01 = m01 + jnp.asarray(dy, dtype) * row_i
    return m10, m01


@jax.jit
def ic_angle(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Intensity-centroid orientation per keypoint, radians in [-π, π).

    θ = atan2(m01, m10) over the circular 31×31 patch — dense moment maps
    + one 2-scalar gather per keypoint (see ``ic_moment_maps``)."""
    H, W = img.shape
    m10, m01 = ic_moment_maps(img)
    u = jnp.clip(uv[:, 0], 0, W - 1)
    v = jnp.clip(uv[:, 1], 0, H - 1)
    return jnp.arctan2(m01[v, u], m10[v, u])


@jax.jit
def brief_descriptors(img_blurred: jax.Array, uv: jax.Array, angle: jax.Array) -> jax.Array:
    """Steered BRIEF-256 → (N, 8) uint32.

    Pattern points rotate by the keypoint angle with rounded (nearest-
    pixel) sampling, exactly the reference's GET_VALUE arithmetic
    (``ORBextractor.cc:122-147``): x' = round(px·cosθ − py·sinθ),
    y' = round(px·sinθ + py·cosθ); bit i set iff I(a_i) < I(b_i).
    """
    H, W = img_blurred.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    pa = jnp.asarray(PATTERN_A, dtype=jnp.float32)  # (256, 2) x, y
    pb = jnp.asarray(PATTERN_B, dtype=jnp.float32)

    def rotate(p):  # (256,2) → (N, 256, 2) int offsets
        x = p[None, :, 0] * ca[:, None] - p[None, :, 1] * sa[:, None]
        y = p[None, :, 0] * sa[:, None] + p[None, :, 1] * ca[:, None]
        return jnp.round(x).astype(jnp.int32), jnp.round(y).astype(jnp.int32)

    ax, ay = rotate(pa)
    bx, by = rotate(pb)
    u0 = uv[:, 0:1]
    v0 = uv[:, 1:2]
    Ia = img_blurred[jnp.clip(v0 + ay, 0, H - 1), jnp.clip(u0 + ax, 0, W - 1)]
    Ib = img_blurred[jnp.clip(v0 + by, 0, H - 1), jnp.clip(u0 + bx, 0, W - 1)]
    bits = (Ia < Ib).astype(jnp.uint32)  # (N, 256)
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)  # (N, 8)


def unpack_descriptors_pm1(desc_u32: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(N, 8) uint32 → (N, 256) ±1 rows for MXU Hamming matmul:
    hamming(a, b) = (256 − aᵀb) / 2 exactly (integers ≤ 256 are exact in
    bf16/f32 accumulation)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc_u32.shape[0], 256)
    return (2.0 * bits.astype(jnp.float32) - 1.0).astype(dtype)
