"""Stereo rectification — the ``Settings`` precompute of the reference
(``Settings::precomputeRectificationMaps``, maps M1l..M2r in
``include/Settings.h:38-120``): undistort + row-align a calibrated
stereo pair so the stereo matcher can search along epipolar rows.

The maps are computed once on the host (OpenCV ``stereoRectify`` +
``initUndistortRectifyMap`` — this is setup, not the hot path) and the
per-frame warp is a bilinear gather; ``remap`` applies it either with
OpenCV on the host or as a jittable XLA gather (``remap_jax``) so it can
fuse with the feature extractor on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera


@dataclasses.dataclass
class StereoRectifier:
    map_l: np.ndarray       # (H, W, 2) float32 source coordinates (x, y)
    map_r: np.ndarray
    cam_rect: PinholeCamera  # rectified pinhole intrinsics (+ bf)

    def remap(self, img_l: np.ndarray, img_r: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        out_l = cv2.remap(img_l, self.map_l[..., 0], self.map_l[..., 1], cv2.INTER_LINEAR)
        out_r = cv2.remap(img_r, self.map_r[..., 0], self.map_r[..., 1], cv2.INTER_LINEAR)
        return out_l, out_r

    def remap_jax(self, img_l, img_r):
        """Jittable bilinear-gather version of :meth:`remap`."""
        import jax.numpy as jnp
        from jax.scipy.ndimage import map_coordinates

        ml = jnp.asarray(self.map_l)
        mr = jnp.asarray(self.map_r)
        out_l = map_coordinates(jnp.asarray(img_l), [ml[..., 1], ml[..., 0]], order=1)
        out_r = map_coordinates(jnp.asarray(img_r), [mr[..., 1], mr[..., 0]], order=1)
        return out_l, out_r


def build_rectifier(cfg: SlamConfig) -> StereoRectifier:
    """Compute rectification maps from ``cfg.camera`` + ``cfg.stereo``
    (≡ Settings member maps; requires OpenCV, host-side, runs once)."""
    import cv2

    st = cfg.stereo
    if st is None:
        raise ValueError("config has no stereo section")
    cam = cfg.camera
    K1 = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float64)
    D1 = np.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], np.float64)
    K2 = np.array([[st.fx, 0, st.cx], [0, st.fy, st.cy], [0, 0, 1]], np.float64)
    D2 = np.array([st.k1, st.k2, st.p1, st.p2, st.k3], np.float64)
    # T_c1_c2 = pose of cam2 in cam1 frame; stereoRectify wants the
    # cam1→cam2 point transform = its inverse
    T12 = np.asarray(st.T_c1_c2, np.float64).reshape(4, 4)
    T21 = np.linalg.inv(T12)
    R, t = T21[:3, :3], T21[:3, 3].reshape(3, 1)
    size = (cam.width, cam.height)
    R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, size, R, t,
        flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1, newImageSize=size,
    )
    m1 = cv2.initUndistortRectifyMap(K1, D1, R1, P1[:3, :3], size, cv2.CV_32FC2)
    m2 = cv2.initUndistortRectifyMap(K2, D2, R2, P2[:3, :3], size, cv2.CV_32FC2)
    fx, fy = float(P1[0, 0]), float(P1[1, 1])
    cx, cy = float(P1[0, 2]), float(P1[1, 2])
    bf = float(abs(P2[0, 3]))  # P2[0,3] = -fx·baseline
    cam_rect = dataclasses.replace(
        cam, fx=fx, fy=fy, cx=cx, cy=cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
        bf=bf if bf > 0 else cam.bf,
    )
    return StereoRectifier(map_l=m1[0], map_r=m2[0], cam_rect=cam_rect)
