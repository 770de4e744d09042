"""Synthetic textured RGB-L world: multi-view-consistent image + LiDAR
rendering with exact ground-truth poses.

The reference validates quality by full dataset runs (SURVEY.md §4);
no KITTI data ships in this environment, so this module provides the
equivalent: a piecewise-planar "street canyon" (ground + two walls + far
wall) with procedural textures, rendered by ray casting — every pixel and
LiDAR return is an exact function of world geometry, so the full
image→FAST→BRIEF→depth→track→map pipeline can be validated end-to-end
against ground truth (and benchmarked with zero host↔device traffic:
rendering is jittable and runs on device).

Geometry conventions match KITTI: camera x right / y down / z forward;
velodyne x forward / y left / z up; ``T_VELO_CAM`` is the axis swap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie

# KITTI-style velodyne→camera axis swap (cam x = −y_v, cam y = −z_v,
# cam z = x_v), small lever arm.
T_VELO_CAM = np.array(
    [[0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, -1.0, -0.08],
     [1.0, 0.0, 0.0, 0.27]], np.float32
)


class World(NamedTuple):
    """Planes n·X = b with texture bases (e1, e2) and texture images."""

    normals: jax.Array   # (P, 3)
    offsets: jax.Array   # (P,)
    e1: jax.Array        # (P, 3) texture u basis (world units per texel·scale)
    e2: jax.Array        # (P, 3)
    tex: jax.Array       # (P, T, T) f32 0..255
    tex_scale: jax.Array  # (P,) texels per meter


def make_world(seed: int = 0, tex_size: int = 512,
               half_width: float = 8.0, ground_y: float = 1.6,
               far_z: float = 120.0) -> World:
    """Street canyon: ground plane, left/right walls, far wall."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 4)
    texs = []
    for k in keys:
        t = jax.random.uniform(k, (tex_size, tex_size), jnp.float32)
        # band-limit: 2 passes of a 5×5 wrap-around box blur (separable
        # roll-and-sum) → blobs a few texels wide (FAST needs contrast at
        # multiple scales)
        for _ in range(2):
            t = sum(jnp.roll(t, r, axis=0) for r in range(-2, 3)) / 5.0
            t = sum(jnp.roll(t, r, axis=1) for r in range(-2, 3)) / 5.0
        t = t - t.min()
        t = t / jnp.maximum(t.max(), 1e-6) * 235.0 + 10.0
        texs.append(t)
    normals = jnp.asarray([
        [0.0, 1.0, 0.0],    # ground: y = ground_y
        [1.0, 0.0, 0.0],    # left wall: x = −half_width
        [1.0, 0.0, 0.0],    # right wall: x = +half_width
        [0.0, 0.0, 1.0],    # far wall: z = far_z
    ], jnp.float32)
    offsets = jnp.asarray([ground_y, -half_width, half_width, far_z], jnp.float32)
    e1 = jnp.asarray([[1, 0, 0], [0, 0, 1], [0, 0, 1], [1, 0, 0]], jnp.float32)
    e2 = jnp.asarray([[0, 0, 1], [0, 1, 0], [0, 1, 0], [0, 1, 0]], jnp.float32)
    tex_scale = jnp.asarray([3.0, 3.0, 3.0, 3.0], jnp.float32)
    return World(normals=normals, offsets=offsets, e1=e1, e2=e2,
                 tex=jnp.stack(texs), tex_scale=tex_scale)


def _sample_tex(tex: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear wrap-around sample of (T, T) at float (u, v)."""
    T = tex.shape[0]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    i0 = jnp.mod(u0.astype(jnp.int32), T)
    i1 = jnp.mod(i0 + 1, T)
    j0 = jnp.mod(v0.astype(jnp.int32), T)
    j1 = jnp.mod(j0 + 1, T)
    a = tex[j0, i0] * (1 - fu) + tex[j0, i1] * fu
    b = tex[j1, i0] * (1 - fu) + tex[j1, i1] * fu
    return a * (1 - fv) + b * fv


def _cast(world: World, origins: jax.Array, dirs: jax.Array):
    """Ray-cast (..., 3) origins/dirs against all planes.

    Returns (t (...,), plane (...,) i32, hit (...,) bool) for the nearest
    positive intersection."""
    n = world.normals          # (P, 3)
    denom = jnp.einsum("pk,...k->...p", n, dirs)
    num = world.offsets - jnp.einsum("pk,...k->...p", n, origins)
    t = num / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t = jnp.where((t > 0.2) & (jnp.abs(denom) > 1e-6), t, jnp.inf)
    plane = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tmin = jnp.min(t, axis=-1)
    return tmin, plane, jnp.isfinite(tmin)


def _shade(world: World, X: jax.Array, plane: jax.Array) -> jax.Array:
    """Texture lookup of world points (..., 3) on their hit planes.

    Three self-similar octaves (1×, 5×, 13×) give contrast across the
    3–120 m depth range while the low octaves keep far-field appearance
    band-limited (descriptor stability across views)."""
    s = world.tex_scale[plane]
    u = jnp.einsum("...k,...k->...", X, world.e1[plane]) * s
    v = jnp.einsum("...k,...k->...", X, world.e2[plane]) * s

    def octaves(p):
        t = world.tex[p]
        return (0.5 * _sample_tex(t, u, v)
                + 0.35 * _sample_tex(t, 5.0 * u + 11.0, 5.0 * v + 7.0)
                + 0.15 * _sample_tex(t, 13.0 * u + 3.0, 13.0 * v + 29.0))

    vals = jnp.stack([octaves(p) for p in range(world.tex.shape[0])])
    return jnp.take_along_axis(vals, plane[None], axis=0)[0]


@functools.partial(jax.jit, static_argnames=("height", "width", "ss"))
def render_image(world: World, Twc: jax.Array, fx: float, fy: float,
                 cx: float, cy: float, height: int, width: int,
                 ss: int = 2) -> jax.Array:
    """Render the (H, W) grayscale view from camera pose Twc (7,).

    ``ss``: supersampling factor — rays are cast on an (ss·H, ss·W) grid
    and box-averaged, approximating the pixel-footprint integration of a
    real sensor (point sampling aliases the fine texture octaves into
    view-dependent noise that destabilizes descriptors)."""
    Hs, Ws = height * ss, width * ss
    ys = (jnp.arange(Hs, dtype=jnp.float32) + 0.5) / ss
    xs = (jnp.arange(Ws, dtype=jnp.float32) + 0.5) / ss
    u, v = jnp.meshgrid(xs, ys)
    d_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    R = lie.quat_to_matrix(Twc[:4])
    c = Twc[4:7]
    d_w = jnp.einsum("ij,hwj->hwi", R, d_cam)
    o = jnp.broadcast_to(c, d_w.shape)
    t, plane, hit = _cast(world, o, d_w)
    X = o + t[..., None] * d_w
    img = jnp.where(hit, _shade(world, X, plane), 0.0)
    if ss > 1:
        img = img.reshape(height, ss, width, ss).mean(axis=(1, 3))
    return img


@functools.partial(jax.jit, static_argnames=("n_az", "n_el"))
def lidar_scan(world: World, Twc: jax.Array, n_az: int = 512, n_el: int = 64,
               az_fov: float = 1.2, el_lo: float = -0.42,
               el_hi: float = 0.05) -> jax.Array:
    """Velodyne-frame scan (n_az·n_el, 4): forward-sector azimuth sweep ×
    elevation fan, returns [x, y, z, 1] with misses at the origin
    (min-dist gating drops them downstream)."""
    az = jnp.linspace(-az_fov, az_fov, n_az)
    el = jnp.linspace(el_lo, el_hi, n_el)
    A, E = jnp.meshgrid(az, el)
    # velodyne frame: x forward, y left, z up
    d_v = jnp.stack([jnp.cos(E) * jnp.cos(A), jnp.cos(E) * jnp.sin(A),
                     jnp.sin(E)], axis=-1)
    Rvc = jnp.asarray(T_VELO_CAM[:, :3])      # cam ← velo rotation
    tvc = jnp.asarray(T_VELO_CAM[:, 3])
    d_c = jnp.einsum("ij,hwj->hwi", Rvc, d_v)  # directions in cam frame
    R = lie.quat_to_matrix(Twc[:4])
    c = Twc[4:7]
    # sensor origin in world: camera pose ∘ (velo origin in cam frame)
    o_c = tvc
    o_w = R @ o_c + c
    d_w = jnp.einsum("ij,hwj->hwi", R, d_c)
    o = jnp.broadcast_to(o_w, d_w.shape)
    t, plane, hit = _cast(world, o, d_w)
    rng = jnp.where(hit, t, 0.0)
    pts_v = d_v * rng[..., None]              # velodyne-frame points
    pts = pts_v.reshape(-1, 3)
    return jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), jnp.float32)], axis=1)


def straight_trajectory(n: int, step: float = 0.8, yaw_rate: float = 0.0,
                        weave: float = 0.0) -> np.ndarray:
    """(n, 7) Twc ground truth: forward motion with optional constant yaw
    (arc) and lateral weave — enough excitation for covisibility to decay
    and keyframes to spawn."""
    poses = []
    x, z, yaw = 0.0, 0.0, 0.0
    for i in range(n):
        q = np.array([np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0], np.float32)
        t = np.array([x + weave * np.sin(0.15 * i), 0.0, z], np.float32)
        poses.append(np.concatenate([q, t]))
        x += step * np.sin(yaw)
        z += step * np.cos(yaw)
        yaw += yaw_rate
    return np.stack(poses).astype(np.float32)


def loop_trajectory(n: int, radius: float = 18.0) -> np.ndarray:
    """(n, 7) circular loop returning to the start — drives loop closure."""
    poses = []
    for i in range(n):
        th = 2.0 * np.pi * i / n
        yaw = th
        q = np.array([np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0], np.float32)
        x = radius * (1.0 - np.cos(th))
        z = radius * np.sin(th)
        poses.append(np.concatenate([q, [x, 0.0, z]]).astype(np.float32))
    return np.stack(poses)


def multi_loop_trajectory(n: int, radius: float = 18.0,
                          period: int = 84) -> np.ndarray:
    """(n, 7) continuous multi-lap circle (phase keeps advancing — no
    pose jump at the lap seam, unlike concatenating ``loop_trajectory``
    slices). ``period`` frames per full revolution."""
    poses = []
    for i in range(n):
        th = 2.0 * np.pi * i / period
        q = np.array([np.cos(th / 2), 0.0, np.sin(th / 2), 0.0], np.float32)
        x = radius * (1.0 - np.cos(th))
        z = radius * np.sin(th)
        poses.append(np.concatenate([q, [x, 0.0, z]]).astype(np.float32))
    return np.stack(poses)


def twc_to_tcw(Twc: np.ndarray) -> np.ndarray:
    return np.asarray(lie.se3_inv(jnp.asarray(Twc)), np.float32)


def synthetic_rgbl_config(width: int = 320, height: int = 192,
                          n_features: int = 600, n_levels: int = 4,
                          loop_closing: bool = True):
    """RGB-L SlamConfig matched to this world's camera/LiDAR geometry
    (small shapes — CPU-testable; the bench uses the KITTI regime)."""
    from orb_slam3_rgbl_tpu.config import SlamConfig, OrbConfig, LidarConfig, RGBL
    from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera

    fx = float(width)
    bf = 0.5 * fx                      # 0.5 m baseline equivalent
    return SlamConfig(
        sensor=RGBL,
        camera=PinholeCamera(
            fx=fx, fy=fx, cx=width / 2.0, cy=height / 2.0,
            width=width, height=height, bf=bf, th_depth=100.0,
        ),
        orb=OrbConfig(n_features=n_features, scale_factor=1.2,
                      n_levels=n_levels, ini_th_fast=12, min_th_fast=7),
        lidar=LidarConfig(
            T_velo_cam=tuple(T_VELO_CAM.reshape(-1).tolist()),
            method="InverseDilation", min_dist=1.5, max_dist=150.0,
            dil_kernel_type="Diamond", dil_kernel_size_u=5, dil_kernel_size_v=7,
        ),
        fps=10.0,
        max_keyframes=512,
        max_map_points=65536,
        loop_closing=loop_closing,
    )


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render_depth(world: World, Twc: jax.Array, fx: float, fy: float,
                 cx: float, cy: float, height: int, width: int) -> jax.Array:
    """(H, W) z-depth image from camera pose Twc — the RGB-D sensor
    analog (ray direction z-component is 1, so depth == ray parameter)."""
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    u, v = jnp.meshgrid(xs, ys)
    d_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    R = lie.quat_to_matrix(Twc[:4])
    c = Twc[4:7]
    d_w = jnp.einsum("ij,hwj->hwi", R, d_cam)
    o = jnp.broadcast_to(c, d_w.shape)
    t, plane, hit = _cast(world, o, d_w)
    return jnp.where(hit, t, 0.0)


def make_box_world(seed: int = 0, tex_size: int = 512, half: float = 14.0,
                   ground_y: float = 1.6) -> World:
    """Closed square room (4 inward-facing walls + ground): a circular
    trajectory inside revisits its own view — the image-level loop-closure
    scenario the straight canyon cannot produce."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 5)
    texs = []
    for k in keys:
        t = jax.random.uniform(k, (tex_size, tex_size), jnp.float32)
        for _ in range(2):
            t = sum(jnp.roll(t, r, axis=0) for r in range(-2, 3)) / 5.0
            t = sum(jnp.roll(t, r, axis=1) for r in range(-2, 3)) / 5.0
        t = t - t.min()
        t = t / jnp.maximum(t.max(), 1e-6) * 235.0 + 10.0
        texs.append(t)
    normals = jnp.asarray([
        [0.0, 1.0, 0.0],   # ground y = ground_y
        [1.0, 0.0, 0.0],   # wall x = −half
        [1.0, 0.0, 0.0],   # wall x = +half
        [0.0, 0.0, 1.0],   # wall z = −half
        [0.0, 0.0, 1.0],   # wall z = +half
    ], jnp.float32)
    offsets = jnp.asarray([ground_y, -half, half, -half, half], jnp.float32)
    e1 = jnp.asarray([[1, 0, 0], [0, 0, 1], [0, 0, 1], [1, 0, 0], [1, 0, 0]],
                     jnp.float32)
    e2 = jnp.asarray([[0, 0, 1], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0]],
                     jnp.float32)
    tex_scale = jnp.asarray([3.0] * 5, jnp.float32)
    return World(normals=normals, offsets=offsets, e1=e1, e2=e2,
                 tex=jnp.stack(texs), tex_scale=tex_scale)
