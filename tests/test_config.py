"""Config-system tests: legacy + new-format (File.version 1.0) YAML
parsing, opencv-matrix blocks, stereo rectification, keypoint
undistortion."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu import config as C
from orb_slam3_rgbl_tpu.geometry import camera as cam_mod

LEGACY_YAML = """%YAML:1.0
Camera.fx: 718.856
Camera.fy: 718.856
Camera.cx: 607.1928
Camera.cy: 185.2157
Camera.width: 1241
Camera.height: 376
Camera.bf: 100.0
Camera.fps: 10.0
ThDepth: 700.0
ORBextractor.nFeatures: 2000
LiDAR.Method: "InverseDilation"
LiDAR.max_dist: 200.0
LiDAR.Tr11: 0.1
LiDAR.Tr12: 0.2
"""

NEW_YAML = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Stereo.ThDepth: 60.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999997256477797,-0.002317135723275,-0.000343393120620,0.110074137800478,
         0.002312067192432,0.999898048507103,-0.014090668452683,-0.000156612054392,
         0.000376008102320,0.014089835846691,0.999900662638081,0.000889382785432,
         0,0,0,1.000000000000000]
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9393e-05
IMU.AccWalk: 3.e-03
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
"""


@pytest.fixture
def legacy_path(tmp_path):
    p = tmp_path / "legacy.yaml"
    p.write_text(LEGACY_YAML)
    return str(p)


@pytest.fixture
def new_path(tmp_path):
    p = tmp_path / "new.yaml"
    p.write_text(NEW_YAML)
    return str(p)


class TestYamlParsing:
    def test_legacy_flat_keys(self, legacy_path):
        cfg = C.load_config(legacy_path, sensor=C.RGBL)
        assert cfg.camera.fx == 718.856
        assert cfg.camera.bf == 100.0
        assert cfg.camera.th_depth == 700.0
        assert cfg.orb.n_features == 2000
        assert cfg.lidar.method == "InverseDilation"
        assert cfg.lidar.T_velo_cam[0] == pytest.approx(0.1)
        assert cfg.stereo is None

    def test_new_format_with_matrices(self, new_path):
        cfg = C.load_config(new_path, sensor=C.IMU_STEREO)
        assert cfg.camera.fx == 458.654
        assert cfg.camera.k1 == pytest.approx(-0.28340811)
        assert cfg.stereo is not None
        assert cfg.stereo.fx == 457.587
        T = np.asarray(cfg.stereo.T_c1_c2).reshape(4, 4)
        assert np.linalg.norm(T[:3, 3]) == pytest.approx(0.11008, abs=1e-4)
        # bf derived from the baseline
        assert cfg.camera.bf == pytest.approx(0.11008 * 458.654, rel=1e-3)
        Tbc = np.asarray(cfg.imu.T_body_cam).reshape(4, 4)
        assert Tbc[0, 1] == pytest.approx(-0.999880929698)
        assert cfg.imu.noise_gyro == pytest.approx(1.7e-4)

    def test_opencv_matrix_block(self, new_path):
        kv = C.parse_opencv_yaml(new_path)
        M = kv["Stereo.T_c1_c2"]
        assert M.shape == (4, 4)
        assert M[3, 3] == 1.0


class TestRectification:
    def test_maps_and_rectified_intrinsics(self, new_path):
        from orb_slam3_rgbl_tpu.geometry.rectify import build_rectifier

        cfg = C.load_config(new_path, sensor=C.STEREO)
        r = build_rectifier(cfg)
        assert r.map_l.shape == (480, 752, 2)
        # rectified baseline must reproduce the calibrated baseline
        assert r.cam_rect.bf / r.cam_rect.fx == pytest.approx(0.11008, abs=1e-3)
        # rectified camera is distortion-free
        assert not r.cam_rect.has_distortion

    def test_remap_jax_matches_cv(self, new_path, rng):
        from orb_slam3_rgbl_tpu.geometry.rectify import build_rectifier

        cfg = C.load_config(new_path, sensor=C.STEREO)
        r = build_rectifier(cfg)
        img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
        l_cv, _ = r.remap(img, img)
        l_jax, _ = r.remap_jax(img, img)
        # borders differ (cv clamps, gather clamps the same way) — interior agree
        assert np.abs(np.asarray(l_jax)[5:-5, 5:-5] - l_cv[5:-5, 5:-5]).max() < 1e-2


class TestUndistortion:
    def test_undistort_inverts_distortion(self, rng):
        cam = C.PinholeCamera(
            fx=458.654, fy=457.296, cx=367.215, cy=248.375,
            k1=-0.2834, k2=0.0739, p1=1.9e-4, p2=1.76e-5,
            width=752, height=480,
        )
        xy = rng.uniform(-0.5, 0.5, (200, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.ones((200, 1), np.float32)], 1)
        uv_dist = cam_mod.project(cam, jnp.asarray(pts))
        uv_un = cam_mod.undistort_points(cam, uv_dist)
        cam0 = dataclasses.replace(cam, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
        uv_ideal = cam_mod.project(cam0, jnp.asarray(pts))
        assert float(jnp.abs(uv_un - uv_ideal).max()) < 5e-3

    def test_system_zeroes_working_distortion(self, new_path):
        from orb_slam3_rgbl_tpu.slam.system import System

        cfg = C.load_config(new_path, sensor=C.MONOCULAR)
        cfg = dataclasses.replace(cfg, stereo=None)
        s = System(cfg)
        assert s._undistort_cam is not None
        assert not s.cam.has_distortion

    def test_system_builds_rectifier_for_stereo(self, new_path):
        from orb_slam3_rgbl_tpu.slam.system import System

        cfg = C.load_config(new_path, sensor=C.STEREO)
        s = System(cfg)
        assert s.rectifier is not None
        assert s.cam.bf == pytest.approx(50.3, abs=1.0)
