"""Per-frame feature extraction pipeline (jitted, fixed shapes).

Replaces the reference ``Frame`` constructors (``Frame.cc:101-378``) +
``ORBextractor::operator()`` (``ORBextractor.cc:1086-1168``): pyramid →
dense FAST → balanced selection → orientation → blur → rBRIEF, then the
RGB-L depth association (``DepthModule::CalculateDepthFromPcd``).

Everything for one frame is a single XLA computation: all pyramid levels
are processed with no host round-trips, and the output is a fixed-size
``FrameFeatures`` pytree (padded + masked), so downstream tracking jits
against stable shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.ops import depth as depth_ops
from orb_slam3_rgbl_tpu.ops import fast as fast_ops
from orb_slam3_rgbl_tpu.ops import orb as orb_ops
from orb_slam3_rgbl_tpu.ops import pyramid as pyr_ops


class FrameFeatures(NamedTuple):
    """Struct-of-arrays feature frame (fixed capacity N = n_features).

    Mirrors the reference ``Frame`` members (``Frame.h:229-258``):
    mvKeysUn → uv, mDescriptors → desc, mvuRight/mvDepth → u_right/depth.
    """

    uv: jax.Array        # (N, 2) f32 — level-0 pixel coords
    response: jax.Array  # (N,)   f32
    octave: jax.Array    # (N,)   i32 — pyramid level
    angle: jax.Array     # (N,)   f32 — radians
    desc: jax.Array      # (N, 8) u32 — packed 256-bit rBRIEF
    valid: jax.Array     # (N,)   bool
    depth: jax.Array     # (N,)   f32 — −1 where unknown
    u_right: jax.Array   # (N,)   f32 — pseudo-stereo column, −1 invalid

    @property
    def n(self) -> int:
        return self.uv.shape[0]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "n_features", "n_levels", "scale_factor",
                     "ini_th", "min_th", "cell", "brief_mode"),
)
def extract_features(
    img: jax.Array,
    height: int,
    width: int,
    n_features: int = 2000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    ini_th: float = 12.0,
    min_th: float = 7.0,
    cell: int = 32,
    brief_mode: str = "continuous",
) -> FrameFeatures:
    """Grayscale f32 (H, W) image → FrameFeatures (depth fields = −1).

    ``brief_mode``:
      * 'continuous' (default) — per-keypoint pattern rotation, the
        reference/OpenCV semantics on integer-rounded blurred
        intensities (the reference blurs into *uchar*). On TPU this runs
        as a Pallas one-hot-MXU kernel (~5× faster than the gather
        formulation), elsewhere as an XLA gather; both are bit-identical.
      * 'binned' — NB=30-bin quantized rotation (ORB-paper rBRIEF),
        marginally cheaper on TPU.
      * 'legacy' — the original per-level gather path on unrounded f32
        intensities (kept for A/B tests).
    """
    from orb_slam3_rgbl_tpu.ops import brief_pallas
    from orb_slam3_rgbl_tpu.ops import frontend_pallas

    use_fused_frontend = (
        frontend_pallas._HAS_PALLAS and jax.default_backend() == "tpu"
    )
    levels = pyr_ops.build_pyramid(img, height, width, n_levels, scale_factor)
    budgets = fast_ops.features_per_level(n_features, n_levels, scale_factor)
    scales = pyr_ops.level_scales(n_levels, scale_factor)

    uvs, resps, octs, angs, descs, valids = [], [], [], [], [], []
    uv_ints, blurs = [], []
    for l, lv in enumerate(levels):
        # pyramid levels smaller than the kernel halos (reflect-101 pad of
        # CHALO=64 cols / HALO=8 rows) take the XLA path
        if use_fused_frontend and lv.shape[0] > frontend_pallas.HALO \
                and lv.shape[1] > frontend_pallas.CHALO:
            score, blurred = frontend_pallas.fast_and_blur(lv)
        else:
            score = fast_ops.fast_score(lv)
            blurred = pyr_ops.gaussian_blur(lv)
        uv_l, resp_l, valid_l = fast_ops.select_keypoints(
            score, budgets[l], cell=cell, ini_th=ini_th, min_th=min_th, margin=19
        )
        ang_l = orb_ops.ic_angle(lv, uv_l)
        if brief_mode == "legacy":
            descs.append(orb_ops.brief_descriptors(blurred, uv_l, ang_l))
        else:
            uv_ints.append(uv_l)
            blurs.append(blurred)
        uvs.append(uv_l.astype(jnp.float32) * scales[l])
        resps.append(resp_l)
        octs.append(jnp.full((budgets[l],), l, jnp.int32))
        angs.append(ang_l)
        valids.append(valid_l)
    if brief_mode != "legacy":
        descs = brief_pallas.descriptors_multilevel(blurs, uv_ints, angs,
                                                    mode=brief_mode)

    n_total = sum(budgets)
    feats = FrameFeatures(
        uv=jnp.concatenate(uvs, axis=0),
        response=jnp.concatenate(resps, axis=0),
        octave=jnp.concatenate(octs, axis=0),
        angle=jnp.concatenate(angs, axis=0),
        desc=jnp.concatenate(descs, axis=0),
        valid=jnp.concatenate(valids, axis=0),
        depth=jnp.full((n_total,), -1.0, jnp.float32),
        u_right=jnp.full((n_total,), -1.0, jnp.float32),
    )
    return feats


def scale_sigma2(n_levels: int = 8, scale_factor: float = 1.2) -> jax.Array:
    """Per-octave measurement variance (reference ``mvLevelSigma2``)."""
    s = jnp.asarray([scale_factor ** (2 * l) for l in range(n_levels)], jnp.float32)
    return s


def inv_scale_sigma2(n_levels: int = 8, scale_factor: float = 1.2) -> jax.Array:
    return 1.0 / scale_sigma2(n_levels, scale_factor)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "method", "dil_kind", "dil_ku", "dil_kv"),
)
def attach_lidar_depth(
    feats: FrameFeatures,
    points: jax.Array,
    P: jax.Array,
    height: int,
    width: int,
    bf: float,
    min_dist: float = 5.0,
    max_dist: float = 200.0,
    method: str = "InverseDilation",
    dil_kind: str = "Diamond",
    dil_ku: int = 5,
    dil_kv: int = 7,
    valid_mask: jax.Array | None = None,
) -> Tuple[FrameFeatures, jax.Array]:
    """RGB-L: run the depth engine and bind per-feature depth
    (≡ reference ``Frame`` RGBL ctor ``Frame.cc:289-378``)."""
    d, ur, dense = depth_ops.compute_depth_from_pointcloud(
        points, P, feats.uv, feats.uv,
        height=height, width=width, bf=bf, method=method,
        min_dist=min_dist, max_dist=max_dist,
        dil_kind=dil_kind, dil_ku=dil_ku, dil_kv=dil_kv,
        valid_mask=valid_mask,
    )
    d = jnp.where(feats.valid, d, -1.0)
    ur = jnp.where(feats.valid, ur, -1.0)
    return feats._replace(depth=d, u_right=ur), dense


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def attach_stereo_depth(
    feats_l: FrameFeatures,
    feats_r: FrameFeatures,
    bf: float,
    min_disp: float = 0.0,
    max_disp: float = 200.0,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> FrameFeatures:
    """Stereo: row-banded Hamming matching of left↔right features and
    pseudo-depth from disparity (≡ ``Frame::ComputeStereoMatches``,
    reference ``Frame.cc:901-1072``)."""
    scale_factors = jnp.asarray([scale_factor ** l for l in range(n_levels)], jnp.float32)
    from orb_slam3_rgbl_tpu.ops.matching import stereo_row_match

    u_right, _ = stereo_row_match(
        feats_l.desc, feats_l.uv[:, 1], feats_l.valid, feats_l.octave,
        feats_r.desc, feats_r.uv[:, 0], feats_r.uv[:, 1], feats_r.valid, feats_r.octave,
        min_disp, max_disp, feats_l.uv[:, 0], scale_factors,
    )
    disp = feats_l.uv[:, 0] - u_right
    good = (u_right >= 0) & (disp > 1e-3)
    depth = jnp.where(good, bf / jnp.where(good, disp, 1.0), -1.0)
    u_right = jnp.where(good, u_right, -1.0)
    return feats_l._replace(depth=depth, u_right=u_right)


def attach_stereo_fisheye_depth(
    feats_l: FrameFeatures,
    feats_r: FrameFeatures,
    cam_l,
    cam_r,
    T_lr: jax.Array,
    bf: float,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> FrameFeatures:
    """Stereo-fisheye (two KannalaBrandt8 cameras, unrectified): mutual
    descriptor matching gated by the fisheye epipolar/triangulation
    consistency check, then two-view triangulation for per-feature depth
    (≡ ``Frame::ComputeStereoFishEyeMatches`` + ``KannalaBrandt8::
    TriangulateMatches``, reference ``Frame.cc:1164+`` /
    ``KannalaBrandt8.cpp``). Rectification-free: fisheye epipolar curves
    make row-banding inapplicable."""
    from orb_slam3_rgbl_tpu.geometry import camera as cam_mod
    from orb_slam3_rgbl_tpu.ops import matching

    d = matching.distance_table(feats_l.desc, feats_r.desc,
                                feats_l.valid, feats_r.valid)
    idx, _ = matching.mutual_best_match(
        d, feats_l.angle, feats_r.angle,
        th=matching.TH_LOW, ratio=0.8, check_rotation=True)
    matched = idx >= 0
    safe = jnp.clip(idx, 0, feats_r.uv.shape[0] - 1)
    uv_r = feats_r.uv[safe]
    s2 = jnp.asarray(scale_factor, jnp.float32) ** (
        2.0 * feats_l.octave.astype(jnp.float32))
    X_l, z, ok = cam_mod.kb8_triangulate_matches(
        cam_l, cam_r, T_lr, feats_l.uv, uv_r, s2, s2)
    good = matched & ok & feats_l.valid
    depth = jnp.where(good, z, -1.0)
    # pseudo-stereo column is undefined for fisheye; the engine's stereo
    # residual keys off u_right >= 0, so mark these as depth-only (mono
    # residual + depth-created landmarks), like the reference which keeps
    # triangulated fisheye points without mvuRight
    return feats_l._replace(depth=depth)


@jax.jit
def attach_depth_map(feats: FrameFeatures, depth_map: jax.Array, bf: float, depth_factor: float = 1.0) -> FrameFeatures:
    """RGB-D: sample a precomputed depth image at the keypoints
    (≡ ``Frame::ComputeStereoFromRGBD``, reference ``Frame.cc:1074``)."""
    d, ur = depth_ops.feature_depth(depth_map / depth_factor, feats.uv, feats.uv, bf)
    d = jnp.where(feats.valid, d, -1.0)
    ur = jnp.where(feats.valid, ur, -1.0)
    return feats._replace(depth=d, u_right=ur)


@functools.partial(jax.jit, static_argnames=("w", "L"))
def refine_stereo_subpixel(
    feats: FrameFeatures,
    gray_l: jax.Array,
    gray_r: jax.Array,
    bf: float,
    w: int = 5,
    L: int = 5,
) -> FrameFeatures:
    """SAD subpixel refinement of stereo matches (reference
    ``Frame::ComputeStereoMatches`` correlation stage, ``Frame.cc:1005-1072``):
    an (2w+1)² patch around the left keypoint slides ±L columns around the
    integer-pixel right match; parabola fitting on the best L1 distances
    gives the sub-pixel column, plus the reference's 1.5·1.4·median
    distance outlier cut. Runs on the level-0 images (the descriptor
    matcher already verified the association at the feature's own scale)."""
    H, W = gray_l.shape
    N = feats.uv.shape[0]
    P = 2 * w + 1
    has = feats.u_right >= 0
    vi = jnp.clip(jnp.round(feats.uv[:, 1]).astype(jnp.int32), w, H - w - 1)
    ui = jnp.clip(jnp.round(feats.uv[:, 0]).astype(jnp.int32), w, W - w - 1)
    ur0 = jnp.clip(jnp.round(feats.u_right).astype(jnp.int32), w + L, W - w - L - 1)

    dy = jnp.arange(-w, w + 1)
    IL = gray_l[vi[:, None, None] + dy[None, :, None],
                ui[:, None, None] + dy[None, None, :]]          # (N, P, P)
    dxr = jnp.arange(-w - L, w + L + 1)
    PR = gray_r[vi[:, None, None] + dy[None, :, None],
                ur0[:, None, None] + dxr[None, None, :]]        # (N, P, P+2L)

    def sad(i, _):
        window = jax.lax.dynamic_slice_in_dim(PR, i, P, axis=2)
        return i + 1, jnp.sum(jnp.abs(IL - window), axis=(1, 2))

    _, dists = jax.lax.scan(lambda c, x: sad(c, x), 0, None, length=2 * L + 1)
    dists = dists.T                                             # (N, 2L+1)
    best = jnp.argmin(dists, axis=1)
    interior = (best > 0) & (best < 2 * L)
    bi = jnp.clip(best, 1, 2 * L - 1)
    rows = jnp.arange(N)
    d1 = dists[rows, bi - 1]
    d2 = dists[rows, bi]
    d3 = dists[rows, bi + 1]
    denom = d1 + d3 - 2.0 * d2
    delta = jnp.where(jnp.abs(denom) > 1e-6, (d1 - d3) / (2.0 * denom), 0.0)
    ok = has & interior & (jnp.abs(delta) <= 1.0)

    best_ur = ur0.astype(jnp.float32) + (bi - L).astype(jnp.float32) + delta
    disparity = feats.uv[:, 0] - best_ur
    ok &= disparity > 0.01
    # median-distance outlier cut (Frame.cc:1059-1072)
    best_d = jnp.where(ok, d2, jnp.inf)
    med = jnp.nanmedian(jnp.where(ok, d2, jnp.nan))
    ok &= best_d < 1.5 * 1.4 * jnp.where(jnp.isnan(med), jnp.inf, med)

    u_right = jnp.where(ok, best_ur, feats.u_right)
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-3), feats.depth)
    return feats._replace(u_right=u_right, depth=depth)
