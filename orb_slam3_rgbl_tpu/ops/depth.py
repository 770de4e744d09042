"""LiDAR → dense depth map engine (the RGB-L novelty), TPU-native.

Functional equivalent of the reference ``DepthModule``
(``src/DepthModule.cc``): project the raw Velodyne cloud through
``P = K·T_velo→cam`` into the image, scatter into a sparse depth map, then
densify with one of three upsampling methods. The reference's serial
per-point scatter loop (``DepthModule.cc:123-137``) becomes a single XLA
``scatter-min``; the morphological/box filters become ``reduce_window``
ops that XLA fuses and vectorizes on the VPU.

Deviations from the reference (intentional, documented):

* Scatter collisions: the reference's serial loop keeps the *last* point
  written per pixel (arbitrary, order-dependent); we keep the *closest*
  (scatter-min), which is the physically correct occlusion handling and
  is deterministic under parallel execution.
* NearestNeighborPixel's OpenCV L2 distance transform is replaced by a
  truncated chamfer transform (iterated 3×3 min-plus) — exact for the
  small radii used (search distance 7 px), and fixed-shape.

All entry points are jit-safe with static image sizes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# structuring elements (mirrors getStructuringElement + the hard-coded
# diamond masks at reference DepthModule.h:138-161)
# ---------------------------------------------------------------------------

def structuring_element(kind: str, ku: int, kv: int) -> np.ndarray:
    """Binary (kv, ku) structuring element: Rectangle | Cross | Ellipse |
    Diamond (diamond is square ku×ku, |dy|+|dx| ≤ ku//2 — matches the
    reference's hard-coded masks)."""
    kind = kind.lower()
    if kind == "diamond":
        r = ku // 2
        yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
        return (np.abs(yy) + np.abs(xx) <= r).astype(np.bool_)
    if kind == "rectangle":
        return np.ones((kv, ku), dtype=np.bool_)
    if kind == "cross":
        m = np.zeros((kv, ku), dtype=np.bool_)
        m[kv // 2, :] = True
        m[:, ku // 2] = True
        return m
    if kind == "ellipse":
        ry, rx = kv / 2.0, ku / 2.0
        yy, xx = np.mgrid[0:kv, 0:ku]
        return (((yy - (kv - 1) / 2) / ry) ** 2 + ((xx - (ku - 1) / 2) / rx) ** 2 <= 1.0)
    raise ValueError(f"unknown structuring element kind: {kind}")


def lidar_projection_matrix(K: np.ndarray, T_velo_cam: np.ndarray) -> np.ndarray:
    """P(3×4) = K(3×3)·T_velo→cam(3×4) — precomputed once, as in
    ``DepthModule::ParseRGBLParameters`` (reference ``DepthModule.cc:286-434``)."""
    K = np.asarray(K, dtype=np.float32).reshape(3, 3)
    T = np.asarray(T_velo_cam, dtype=np.float32).reshape(3, 4)
    return (K @ T).astype(np.float32)


# ---------------------------------------------------------------------------
# projection + scatter
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("height", "width"))
def project_pointcloud(
    points: jax.Array,
    P: jax.Array,
    height: int,
    width: int,
    min_dist: float = 5.0,
    max_dist: float = 200.0,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """Project a LiDAR cloud into a sparse depth image.

    Args:
      points: (N, 3) or (N, 4) xyz[+reflectance] in LiDAR frame. Fixed N
        (pad with zeros and pass ``valid_mask``).
      P: (3, 4) combined projection ``K·T_velo→cam``.
      valid_mask: optional (N,) bool for padded points.

    Returns:
      (height, width) float32 depth map, 0 where empty.

    Mirrors ``DepthModule::ProjectPointcloudToImage`` (reference
    ``DepthModule.cc:106-139``): strict bounds u,v ∈ (0, size), distance
    gate d ∈ (min_dist, max_dist), truncating float→int pixel indexing.
    Collisions resolve to the nearest point (see module docstring).
    """
    xyz = points[..., :3]
    ones = jnp.ones_like(xyz[..., :1])
    homog = jnp.concatenate([xyz, ones], axis=-1)  # (N, 4)
    proj = homog @ P.T  # (N, 3)
    d = proj[..., 2]
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    u = proj[..., 0] / safe_d
    v = proj[..., 1] / safe_d
    ok = (u > 0) & (v > 0) & (u < width) & (v < height) & (d > min_dist) & (d < max_dist)
    if valid_mask is not None:
        ok = ok & valid_mask
    ui = jnp.clip(u.astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, height - 1)
    flat = jnp.where(ok, vi * width + ui, height * width)  # invalid → dump slot
    big = jnp.float32(jnp.inf)
    grid = jnp.full((height * width + 1,), big, dtype=jnp.float32)
    grid = grid.at[flat].min(jnp.where(ok, d.astype(jnp.float32), big))
    depth = jnp.where(jnp.isfinite(grid[: height * width]), grid[: height * width], 0.0)
    return depth.reshape(height, width)


# ---------------------------------------------------------------------------
# upsampling: InverseDilation (the default KITTI RGB-L method)
# ---------------------------------------------------------------------------

def _masked_window_max(img: jax.Array, mask: np.ndarray) -> jax.Array:
    """Grayscale dilation of ``img`` by binary structuring element ``mask``.

    Implemented as a max over statically-unrolled shifts (the masks are
    tiny — ≤ 81 taps — and XLA fuses the shifted maxes into one VPU loop;
    for the rectangle case a single separable reduce_window is used).
    """
    kv, ku = mask.shape
    cy, cx = kv // 2, ku // 2
    if mask.all():
        # separable fast path
        return jax.lax.reduce_window(
            img, -jnp.inf, jax.lax.max,
            window_dimensions=(kv, ku), window_strides=(1, 1),
            padding=((cy, kv - 1 - cy), (cx, ku - 1 - cx)),
        )
    H, W = img.shape
    pad = jnp.pad(img, ((cy, kv - 1 - cy), (cx, ku - 1 - cx)), constant_values=-jnp.inf)
    out = jnp.full_like(img, -jnp.inf)
    for dy in range(kv):
        for dx in range(ku):
            if mask[dy, dx]:
                out = jnp.maximum(out, jax.lax.dynamic_slice(pad, (dy, dx), (H, W)))
    return out


@functools.partial(jax.jit, static_argnames=("kernel_kind", "ku", "kv"))
def upsample_inverse_dilation(
    raw_depth: jax.Array,
    max_dist: float = 200.0,
    kernel_kind: str = "Diamond",
    ku: int = 5,
    kv: int = 7,
) -> jax.Array:
    """Nearest-surface-wins densification via inverted morphological dilation.

    Equivalent to ``DepthModule::Upsample_InverseDilation`` (reference
    ``DepthModule.cc:230-274``): invert depth about max_dist (empty → 0
    after threshold), grayscale-dilate with the structuring element, then
    re-invert; pixels with no occupied neighbor inside the element stay 0.
    """
    mask = structuring_element(kernel_kind, ku, kv)
    occupied = raw_depth > 0
    inv = jnp.where(occupied, max_dist - raw_depth, -jnp.inf)
    dilated = _masked_window_max(inv, mask)
    has_neighbor = jnp.isfinite(dilated)
    return jnp.where(has_neighbor, max_dist - dilated, 0.0)


# ---------------------------------------------------------------------------
# upsampling: AverageFiltering (normalized box convolution)
# ---------------------------------------------------------------------------

def _window_sum(img: jax.Array, k: int) -> jax.Array:
    c = k // 2
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add,
        window_dimensions=(k, k), window_strides=(1, 1),
        padding=((c, k - 1 - c), (c, k - 1 - c)),
    )


@functools.partial(jax.jit, static_argnames=("kernel_size", "pre_dilate", "pre_kind", "pre_size"))
def upsample_average_filtering(
    raw_depth: jax.Array,
    kernel_size: int = 5,
    pre_dilate: bool = True,
    pre_kind: str = "Diamond",
    pre_size: int = 3,
    max_dist: float = 200.0,
) -> jax.Array:
    """Normalized box filter: box(depth) / box(occupancy).

    Equivalent to ``DepthModule::Upsample_AverageFiltering`` (reference
    ``DepthModule.cc:200-228``), with the optional inverse-dilation
    pre-pass enabled by ``bDoDilationPreprocessing`` (the reference config
    default uses Diamond-3). Empty neighborhoods yield 0.
    """
    if pre_dilate:
        raw_depth = upsample_inverse_dilation(
            raw_depth, max_dist=max_dist, kernel_kind=pre_kind, ku=pre_size, kv=pre_size
        )
    occ = (raw_depth > 0).astype(jnp.float32)
    s = _window_sum(raw_depth, kernel_size)
    n = _window_sum(occ, kernel_size)
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)


# ---------------------------------------------------------------------------
# upsampling: NearestNeighborPixel (feature-sparse)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("search_radius",))
def chamfer_distance(occupancy: jax.Array, search_radius: int = 7) -> jax.Array:
    """Truncated distance-to-nearest-occupied-pixel transform.

    Iterated 3×3 min-plus relaxation with L2 chamfer weights (1, √2) —
    replaces ``cv::distanceTransform(DIST_L2, MASK_5)`` (reference
    ``DepthModule.cc:160``) for the bounded radii this module needs.
    Distances are capped at ``search_radius + 1``.
    """
    cap = jnp.float32(search_radius + 1)
    d = jnp.where(occupancy, 0.0, cap)
    sqrt2 = jnp.float32(math.sqrt(2.0))
    weights = np.array([[math.sqrt(2), 1, math.sqrt(2)], [1, 0, 1], [math.sqrt(2), 1, math.sqrt(2)]], np.float32)

    def relax(_, d):
        H, W = d.shape
        pad = jnp.pad(d, 1, constant_values=cap)
        best = d
        for dy in range(3):
            for dx in range(3):
                if dy == 1 and dx == 1:
                    continue
                best = jnp.minimum(best, jax.lax.dynamic_slice(pad, (dy, dx), (H, W)) + weights[dy, dx])
        return jnp.minimum(best, cap)

    return jax.lax.fori_loop(0, search_radius + 1, relax, d)


@functools.partial(jax.jit, static_argnames=("search_radius",))
def nearest_neighbor_depth_at_keypoints(
    raw_depth: jax.Array,
    kp_uv: jax.Array,
    search_radius: int = 7,
) -> jax.Array:
    """Per-keypoint nearest-neighbor depth lookup.

    Equivalent to ``DepthModule::Upsample_NearestNeighbor_Pixel``
    (reference ``DepthModule.cc:145-198``): the distance transform gives
    each keypoint a search radius r; the depth is the max over the
    (2(r+1))² window anchored like the reference's padded Rect. Keypoints
    whose radius ≥ search_radius get 0 (no depth).

    Reformulated fixed-shape: precompute window-max maps for every radius
    1..search_radius (shared across the 2000 keypoints), then gather.
    """
    H, W = raw_depth.shape
    dist = chamfer_distance(raw_depth > 0, search_radius)

    # max-pool maps for each window size 2r, r = 1..R; window anchored at
    # [v-r, v+r) × [u-r, u+r)  (matches the reference Rect arithmetic).
    pools = []
    for r in range(1, search_radius + 1):
        pools.append(
            jax.lax.reduce_window(
                raw_depth, -jnp.inf, jax.lax.max,
                window_dimensions=(2 * r, 2 * r), window_strides=(1, 1),
                padding=((r, r - 1), (r, r - 1)),
            )
        )
    pooled = jnp.stack(pools, axis=0)  # (R, H, W)

    u = jnp.clip(kp_uv[..., 0].astype(jnp.int32), 0, W - 1)
    v = jnp.clip(kp_uv[..., 1].astype(jnp.int32), 0, H - 1)
    r_kp = dist[v, u].astype(jnp.int32)  # int cast truncation, as reference
    within = r_kp < search_radius
    r_sel = jnp.clip(r_kp, 0, search_radius - 1)  # maps to pooled[r_sel] = window 2(r+1)
    d = pooled[r_sel, v, u]
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    return jnp.where(within, jnp.maximum(d, 0.0), 0.0)


# ---------------------------------------------------------------------------
# feature depth sampling
# ---------------------------------------------------------------------------

@jax.jit
def feature_depth(
    depth_map: jax.Array,
    kp_uv: jax.Array,
    kp_uv_undist: jax.Array,
    bf: float,
):
    """Sample depth at keypoint pixels and synthesize pseudo-stereo uRight.

    Equivalent to ``DepthModule::GetFeatureDepthFromDepthMap`` (reference
    ``DepthModule.cc:82-104``): d = map[int(v), int(u)]; if d > 0 then
    depth=d, uRight = u_undist − bf/d else both −1.
    """
    H, W = depth_map.shape
    u = jnp.clip(kp_uv[..., 0].astype(jnp.int32), 0, W - 1)
    v = jnp.clip(kp_uv[..., 1].astype(jnp.int32), 0, H - 1)
    d = depth_map[v, u]
    valid = d > 0
    depth = jnp.where(valid, d, -1.0)
    u_right = jnp.where(valid, kp_uv_undist[..., 0] - bf / jnp.where(valid, d, 1.0), -1.0)
    return depth, u_right


def compute_depth_from_pointcloud(
    points: jax.Array,
    P: jax.Array,
    kp_uv: jax.Array,
    kp_uv_undist: jax.Array,
    *,
    height: int,
    width: int,
    bf: float,
    method: str = "InverseDilation",
    min_dist: float = 5.0,
    max_dist: float = 200.0,
    dil_kind: str = "Diamond",
    dil_ku: int = 5,
    dil_kv: int = 7,
    avg_kernel: int = 5,
    avg_pre_dilate: bool = True,
    avg_pre_kind: str = "Diamond",
    avg_pre_size: int = 3,
    nn_search_radius: int = 7,
    valid_mask: jax.Array | None = None,
):
    """Master function ≡ ``DepthModule::CalculateDepthFromPcd`` (reference
    ``DepthModule.cc:50-79``). Returns (depth_per_kp, u_right_per_kp,
    dense_depth_map)."""
    raw = project_pointcloud(points, P, height, width, min_dist, max_dist, valid_mask)
    if method == "None":
        dense = raw
    elif method == "InverseDilation":
        dense = upsample_inverse_dilation(raw, max_dist, dil_kind, dil_ku, dil_kv)
    elif method == "AverageFiltering":
        dense = upsample_average_filtering(
            raw, avg_kernel, avg_pre_dilate, avg_pre_kind, avg_pre_size, max_dist
        )
    elif method == "NearestNeighborPixel":
        d = nearest_neighbor_depth_at_keypoints(raw, kp_uv, nn_search_radius)
        valid = d > 0
        depth = jnp.where(valid, d, -1.0)
        u_right = jnp.where(valid, kp_uv_undist[..., 0] - bf / jnp.where(valid, d, 1.0), -1.0)
        return depth, u_right, raw
    else:
        raise ValueError(f"unknown upsampling method: {method}")
    depth, u_right = feature_depth(dense, kp_uv, kp_uv_undist, bf)
    return depth, u_right, dense
