"""Stereo-fisheye (KannalaBrandt8) depth path — wiring + correctness for
``kb8_triangulate_matches`` / ``kb8_epipolar_constrain`` /
``frame.attach_stereo_fisheye_depth`` (reference ``KannalaBrandt8.cpp``
TriangulateMatches/epipolarConstrain + ``Frame::ComputeStereoFishEyeMatches``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.geometry import lie, camera as cam_mod
from orb_slam3_rgbl_tpu.slam import frame as frame_mod

# TUM-VI-like fisheye pair
CAM_L = cam_mod.KannalaBrandt8Camera(
    fx=190.978, fy=190.973, cx=254.932, cy=256.897,
    k0=0.00348, k1=0.000715, k2=-0.0020532, k3=0.000202, width=512, height=512)
CAM_R = cam_mod.KannalaBrandt8Camera(
    fx=190.44, fy=190.44, cx=252.07, cy=254.95,
    k0=0.0034, k1=0.0008, k2=-0.0021, k3=0.0002, width=512, height=512)
BASELINE = 0.101


def _T_lr():
    # right camera 10.1 cm to the right of the left, tiny rotation
    tau = np.array([BASELINE, 0.0, 0.0, 0.0, 0.01, 0.0], np.float32)
    return jnp.asarray(np.asarray(lie.se3_exp(jnp.asarray(tau)), np.float32))


def _world_points(rng, n=120):
    # spread across the (wide) fisheye FOV, 1-10 m out
    theta = rng.uniform(-1.0, 1.0, n)   # up to ~57° off-axis
    phi = rng.uniform(0, 2 * np.pi, n)
    # indoor range: the 10 cm baseline yields enough parallax to pass the
    # reference's 0.9998 cosine gate (KannalaBrandt8.cpp:246) only for
    # points within a few meters
    r = rng.uniform(0.5, 3.0, n)
    return np.stack([
        r * np.sin(theta) * np.cos(phi),
        r * np.sin(theta) * np.sin(phi),
        r * np.cos(theta),
    ], 1).astype(np.float32)


class TestKb8Triangulation:
    def test_project_unproject_roundtrip(self, rng):
        X = _world_points(rng)
        uv = cam_mod.kb8_project(CAM_L, jnp.asarray(X))
        rays = cam_mod.kb8_unproject(CAM_L, uv)
        dirs = X / X[:, 2:3]
        np.testing.assert_allclose(np.asarray(rays), dirs, atol=1e-3)

    def test_triangulate_matches_recovers_depth(self, rng):
        X = _world_points(rng)
        T_lr = _T_lr()
        uv_l = np.asarray(cam_mod.kb8_project(CAM_L, jnp.asarray(X)))
        X_r = np.asarray(lie.se3_apply(lie.se3_inv(T_lr), jnp.asarray(X)))
        uv_r = np.asarray(cam_mod.kb8_project(CAM_R, jnp.asarray(X_r)))
        s2 = np.ones(len(X), np.float32)
        X_est, z, ok = cam_mod.kb8_triangulate_matches(
            CAM_L, CAM_R, T_lr, jnp.asarray(uv_l), jnp.asarray(uv_r),
            jnp.asarray(s2), jnp.asarray(s2))
        ok = np.asarray(ok)
        in_img = ((uv_l > 5) & (uv_l < 507)).all(1) & ((uv_r > 5) & (uv_r < 507)).all(1)
        assert ok[in_img].mean() > 0.9, ok[in_img].mean()
        err = np.abs(np.asarray(z)[ok] - X[ok, 2]) / X[ok, 2]
        assert np.median(err) < 0.02, np.median(err)

    def test_epipolar_constrain_separates_true_from_false(self, rng):
        X = _world_points(rng)
        T_lr = _T_lr()
        uv_l = np.asarray(cam_mod.kb8_project(CAM_L, jnp.asarray(X)))
        X_r = np.asarray(lie.se3_apply(lie.se3_inv(T_lr), jnp.asarray(X)))
        uv_r = np.asarray(cam_mod.kb8_project(CAM_R, jnp.asarray(X_r)))
        in_img = ((uv_l > 5) & (uv_l < 507)).all(1) & ((uv_r > 5) & (uv_r < 507)).all(1)
        s2 = jnp.ones(len(X), jnp.float32)
        ok_true = np.asarray(cam_mod.kb8_epipolar_constrain(
            CAM_L, CAM_R, T_lr, jnp.asarray(uv_l), jnp.asarray(uv_r), s2))
        # shuffled (wrong) correspondences must mostly fail the gate
        perm = rng.permutation(len(X))
        ok_false = np.asarray(cam_mod.kb8_epipolar_constrain(
            CAM_L, CAM_R, T_lr, jnp.asarray(uv_l), jnp.asarray(uv_r[perm]), s2))
        assert ok_true[in_img].mean() > 0.9
        assert ok_false[in_img].mean() < 0.2


class TestStereoFisheyeFrame:
    def test_attach_depth(self, rng):
        n_feat = 256
        X = _world_points(rng, 150)
        T_lr = _T_lr()
        uv_l = np.asarray(cam_mod.kb8_project(CAM_L, jnp.asarray(X)))
        X_r = np.asarray(lie.se3_apply(lie.se3_inv(T_lr), jnp.asarray(X)))
        uv_r = np.asarray(cam_mod.kb8_project(CAM_R, jnp.asarray(X_r)))
        keep = (((uv_l > 10) & (uv_l < 502)).all(1)
                & ((uv_r > 10) & (uv_r < 502)).all(1))
        X, uv_l, uv_r = X[keep], uv_l[keep], uv_r[keep]
        m = len(X)
        desc = rng.integers(0, 2**32, (m, 8), dtype=np.uint32)

        def feats_of(uv):
            a = np.zeros((n_feat, 2), np.float32)
            d = np.zeros((n_feat, 8), np.uint32)
            v = np.zeros(n_feat, bool)
            a[:m] = uv
            d[:m] = desc
            v[:m] = True
            return frame_mod.FrameFeatures(
                uv=jnp.asarray(a), response=jnp.zeros(n_feat),
                octave=jnp.zeros(n_feat, jnp.int32),
                angle=jnp.zeros(n_feat, jnp.float32), desc=jnp.asarray(d),
                valid=jnp.asarray(v),
                depth=jnp.full(n_feat, -1.0, jnp.float32),
                u_right=jnp.full(n_feat, -1.0, jnp.float32))

        fl, fr = feats_of(uv_l), feats_of(uv_r)
        out = frame_mod.attach_stereo_fisheye_depth(
            fl, fr, CAM_L, CAM_R, T_lr, bf=BASELINE * CAM_L.fx)
        depth = np.asarray(out.depth)[:m]
        got = depth > 0
        assert got.mean() > 0.85, got.mean()
        err = np.abs(depth[got] - X[got, 2]) / X[got, 2]
        assert np.median(err) < 0.02, np.median(err)
