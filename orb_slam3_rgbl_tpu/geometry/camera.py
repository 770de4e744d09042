"""Camera models: pinhole and Kannala-Brandt fisheye.

Functional replacements for the reference's ``GeometricCamera`` hierarchy
(``src/CameraModels/GeometricCamera.h:61-86``: project / unproject /
projectJac) — Pinhole (``Pinhole.cpp``) and KannalaBrandt8
(``KannalaBrandt8.cpp``). All functions broadcast over leading axes and
are jit/vmap-safe.

A camera is a small dataclass of static floats (hashable, usable as a jit
static argument) plus pure functions taking explicit parameter arrays when
differentiability w.r.t. intrinsics is needed (it never is in this system).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """fx, fy, cx, cy (+ optional radial-tangential distortion k1..k3, p1, p2).

    KITTI sequences are pre-rectified (all distortion zero —
    ``Examples/RGB-L/KITTI00-02.yaml:14-18``).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 1241
    height: int = 376
    bf: float = 0.0         # stereo baseline × fx (Camera.bf)
    th_depth: float = 0.0   # close/far threshold = bf × ThDepth / fx

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def baseline(self) -> float:
        return self.bf / self.fx


def project(cam: PinholeCamera, pts_cam: jax.Array) -> jax.Array:
    """Camera-frame points (..., 3) → pixel coordinates (..., 2).

    Matches ``Pinhole::project`` (reference ``Pinhole.cpp``): perspective
    divide then K. Distortion is applied if configured.
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = pts_cam[..., 0] * inv_z
    y = pts_cam[..., 1] * inv_z
    if cam.has_distortion:
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        x, y = xd, yd
    u = cam.fx * x + cam.cx
    v = cam.fy * y + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Pixels (..., 2) → unit-depth bearing (..., 3) (z = 1).

    ``Pinhole::unproject`` (reference ``Pinhole.cpp``). Distorted models
    would need iterative undistortion; KITTI is rectified so the linear
    inverse is exact here.
    """
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def undistort_points(cam: PinholeCamera, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Distorted pixels (..., 2) → undistorted pixels (..., 2) under the
    same K — ``Frame::UndistortKeyPoints`` (reference ``Frame.cc:837``,
    cv::undistortPoints semantics). Fixed-iteration compensation of the
    radial-tangential model (jittable; identity when no distortion)."""
    if not cam.has_distortion:
        return uv
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        return ((xd - dx) / radial, (yd - dy) / radial)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([cam.fx * x + cam.cx, cam.fy * y + cam.cy], axis=-1)


def project_jacobian(cam: PinholeCamera, pts_cam: jax.Array) -> jax.Array:
    """d(u,v)/d(X,Y,Z) for camera-frame points — (..., 2, 3).

    Matches ``Pinhole::projectJac`` (reference ``Pinhole.cpp``), the
    Jacobian used by every reprojection factor in the optimizer
    (``OptimizableTypes.h:31-196``). Distortion-free form.
    """
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def in_image(cam: PinholeCamera, uv: jax.Array, margin: float = 0.0) -> jax.Array:
    """Boolean mask (...) — pixel within image bounds (frustum gate used by
    ``Frame::isInFrustum``, reference ``Frame.cc:602``)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= margin)
        & (u < cam.width - margin)
        & (v >= margin)
        & (v < cam.height - margin)
    )


# ---------------------------------------------------------------------------
# Kannala-Brandt 8-parameter fisheye (EuRoC/TUM-VI stereo-fisheye support)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class KannalaBrandt8Camera:
    """Equidistant fisheye: r(θ) = θ + k0 θ³ + k1 θ⁵ + k2 θ⁷ + k3 θ⁹.

    Functional mirror of reference ``KannalaBrandt8.cpp`` (project at
    ``:44``-ish, unproject via Newton on θ).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k0: float = 0.0
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    width: int = 752
    height: int = 480
    bf: float = 0.0
    th_depth: float = 0.0


def kb8_project(cam: KannalaBrandt8Camera, pts_cam: jax.Array) -> jax.Array:
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + 1e-18)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (cam.k0 + t2 * (cam.k1 + t2 * (cam.k2 + t2 * cam.k3))))
    scale = d / r
    u = cam.fx * scale * x + cam.cx
    v = cam.fy * scale * y + cam.cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(cam: KannalaBrandt8Camera, uv: jax.Array, iters: int = 10) -> jax.Array:
    """Invert the distortion polynomial with fixed-iteration Newton
    (static trip count — TPU-friendly; reference uses a while loop)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.sqrt(mx * mx + my * my + 1e-18)

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (cam.k0 + t2 * (cam.k1 + t2 * (cam.k2 + t2 * cam.k3)))) - d
        fp = 1.0 + t2 * (3 * cam.k0 + t2 * (5 * cam.k1 + t2 * (7 * cam.k2 + t2 * 9 * cam.k3)))
        return theta - f / fp

    theta = jax.lax.fori_loop(0, iters, body, d)
    scale = jnp.tan(theta) / d
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jacobian(cam: KannalaBrandt8Camera, pts_cam: jax.Array) -> jax.Array:
    """(..., 2, 3) ∂uv/∂pt — autodiff mirror of the reference's analytic
    ``KannalaBrandt8::projectJac``; batched over leading axes."""
    flat = pts_cam.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(lambda p: kb8_project(cam, p)))(flat)
    return J.reshape(*pts_cam.shape[:-1], 2, 3)


def kb8_triangulate_matches(
    cam_l: KannalaBrandt8Camera,
    cam_r: KannalaBrandt8Camera,
    T_lr: jax.Array,
    uv_l: jax.Array,
    uv_r: jax.Array,
    sigma2_l: jax.Array,
    sigma2_r: jax.Array,
    unc_th: float = 5.991,
    min_parallax_cos: float = 0.9998,
):
    """Stereo-fisheye triangulation ≡ ``KannalaBrandt8::TriangulateMatches``
    (reference ``KannalaBrandt8.cpp``, used by the stereo-fisheye ``Frame``
    ctor): unproject both rays, gate on parallax, DLT-triangulate in the
    left-camera frame, verify cheirality + reprojection χ² in both views.

    Args:
      T_lr: (7,) SE3 pose of the *right* camera expressed in the left
        frame (the reference's ``mTlr``).
      uv_l, uv_r: (..., 2) matched pixel observations.
      sigma2_l, sigma2_r: (...,) per-feature scale variances.

    Returns:
      (X_l (..., 3) point in the left-camera frame, depth_l (...,),
      valid (...,) bool).
    """
    from orb_slam3_rgbl_tpu.geometry import lie, triangulation

    r1 = kb8_unproject(cam_l, uv_l)  # rays, z=1
    r2 = kb8_unproject(cam_r, uv_r)
    # parallax between the rays in a common (left) frame
    R_lr = lie.quat_to_matrix(lie.se3_rot(T_lr))
    r2_in_l = jnp.einsum("ij,...j->...i", R_lr, r2)
    cosp = jnp.sum(r1 * r2_in_l, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2_in_l, axis=-1) + 1e-12
    )
    # triangulate with world = left-camera frame
    Tc1w = jnp.broadcast_to(lie.se3_identity(), (*uv_l.shape[:-1], 7))
    Tc2w = jnp.broadcast_to(lie.se3_inv(T_lr), (*uv_l.shape[:-1], 7))
    X_l = triangulation.triangulate_dlt(r1, r2, Tc1w, Tc2w)
    z1 = X_l[..., 2]
    X_r = lie.se3_apply(lie.se3_inv(T_lr), X_l)
    z2 = X_r[..., 2]
    e1 = kb8_project(cam_l, X_l) - uv_l
    e2 = kb8_project(cam_r, X_r) - uv_r
    chi1 = jnp.sum(e1 * e1, axis=-1) / jnp.maximum(sigma2_l, 1e-12)
    chi2 = jnp.sum(e2 * e2, axis=-1) / jnp.maximum(sigma2_r, 1e-12)
    valid = (
        (cosp < min_parallax_cos)
        & (z1 > 0)
        & (z2 > 0)
        & (chi1 < unc_th)
        & (chi2 < unc_th)
    )
    return X_l, z1, valid


def kb8_epipolar_constrain(
    cam1: KannalaBrandt8Camera,
    cam2: KannalaBrandt8Camera,
    T_12: jax.Array,
    uv1: jax.Array,
    uv2: jax.Array,
    sigma2: jax.Array,
    unc_th: float = 5.991,
) -> jax.Array:
    """Fisheye epipolar gate ≡ ``KannalaBrandt8::epipolarConstrain``
    (which triangulates and accepts if the match triangulates
    consistently — lines are curves under fisheye distortion, so the
    pinhole point-to-line test does not apply)."""
    _, _, valid = kb8_triangulate_matches(
        cam1, cam2, T_12, uv1, uv2, sigma2, sigma2, unc_th=unc_th,
        # pure consistency check: cos ≤ 1 < 2 always passes — a 1.0 bound
        # would reject exactly-parallel rays on float noise (ADVICE r2)
        min_parallax_cos=2.0,
    )
    return valid


# ---------------------------------------------------------------------------
# Generic dispatch — optimizer residuals parameterized by camera model
# (reference reprojection edges project through the abstract
# ``GeometricCamera``, OptimizableTypes.h:31-196 / G2oTypes.h:74-817, so
# fisheye datasets optimize native; the solvers here take the camera as a
# static jit argument and branch at trace time)
# ---------------------------------------------------------------------------

def is_fisheye(cam) -> bool:
    return isinstance(cam, KannalaBrandt8Camera)


def geo_project(cam, pts_cam: jax.Array) -> jax.Array:
    """(..., 3) camera-frame points → (..., 2) pixels, any camera model."""
    if is_fisheye(cam):
        return kb8_project(cam, pts_cam)
    return project(cam, pts_cam)


def geo_project_jacobian(cam, pts_cam: jax.Array) -> jax.Array:
    """(..., 2, 3) ∂uv/∂pt, any camera model."""
    if is_fisheye(cam):
        return kb8_project_jacobian(cam, pts_cam)
    return project_jacobian(cam, pts_cam)


def geo_unproject(cam, uv: jax.Array) -> jax.Array:
    """(..., 2) pixels → (..., 3) z=1 bearing, any camera model."""
    if is_fisheye(cam):
        return kb8_unproject(cam, uv)
    return unproject(cam, uv)


def np_geo_project(cam, pts_cam):
    """Host-side (numpy) projection for the per-frame matching paths —
    avoids a device dispatch per classic-ladder stage."""
    import numpy as np

    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    if is_fisheye(cam):
        r = np.sqrt(x * x + y * y + 1e-18)
        theta = np.arctan2(r, z)
        t2 = theta * theta
        d = theta * (1.0 + t2 * (cam.k0 + t2 * (cam.k1 + t2 * (cam.k2 + t2 * cam.k3))))
        s = d / r
        return np.stack([cam.fx * s * x + cam.cx, cam.fy * s * y + cam.cy], axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = cam.fx * x / z + cam.cx
        v = cam.fy * y / z + cam.cy
    return np.stack([np.nan_to_num(u), np.nan_to_num(v)], axis=-1)


def np_geo_unproject(cam, uv, iters: int = 10):
    """Host-side (numpy) z=1 bearing for any camera model (Newton on θ
    for KB8, mirroring :func:`kb8_unproject`)."""
    import numpy as np

    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    if is_fisheye(cam):
        d = np.sqrt(mx * mx + my * my + 1e-18)
        theta = d.copy()
        for _ in range(iters):
            t2 = theta * theta
            f = theta * (1.0 + t2 * (cam.k0 + t2 * (cam.k1 + t2 * (cam.k2 + t2 * cam.k3)))) - d
            fp = 1.0 + t2 * (3 * cam.k0 + t2 * (5 * cam.k1 + t2 * (7 * cam.k2 + t2 * 9 * cam.k3)))
            theta = theta - f / fp
        s = np.tan(theta) / d
        return np.stack([mx * s, my * s, np.ones_like(mx)], axis=-1)
    return np.stack([mx, my, np.ones_like(mx)], axis=-1)


def stereo_depth_from_disparity(cam: PinholeCamera, u_left: jax.Array, u_right: jax.Array) -> jax.Array:
    """Depth from pseudo-stereo: z = bf / (uL − uR).

    The reference stores matched features as ``mvuRight`` and recovers
    depth the same way (``Frame.cc:901-1072``, ``UnprojectStereo``
    ``Frame.cc:1137``)."""
    disp = u_left - u_right
    return cam.bf / jnp.where(jnp.abs(disp) < 1e-6, 1e-6, disp)


def virtual_right_u(cam: PinholeCamera, u: jax.Array, depth: jax.Array) -> jax.Array:
    """Synthesize the pseudo-stereo right coordinate uR = u − bf/z used by the
    RGB-D/RGB-L paths (reference ``DepthModule.cc:82-104`` and
    ``Frame::ComputeStereoFromRGBD`` ``Frame.cc:1074``)."""
    valid = depth > 0
    uR = u - cam.bf / jnp.where(valid, depth, 1.0)
    return jnp.where(valid, uR, -1.0)
