"""Depth-module tests: projection/scatter vs numpy, upsampling vs OpenCV."""

import numpy as np
import cv2
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.ops import depth as depth_ops
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config

H, W = 96, 256


def make_cloud(rng, n=5000):
    # points in front of a KITTI-like camera after extrinsics: LiDAR x forward
    pts = np.stack(
        [
            rng.uniform(6, 150, n),      # x forward
            rng.uniform(-30, 30, n),     # y left
            rng.uniform(-2, 4, n),       # z up
            np.ones(n),
        ],
        axis=1,
    ).astype(np.float32)
    return pts


def reference_projection(pts, P, h, w, min_d, max_d):
    """Direct numpy mirror of DepthModule::ProjectPointcloudToImage
    (scatter order-independent: keep min depth per pixel)."""
    proj = pts[:, :4] @ P.T
    d = proj[:, 2]
    u = proj[:, 0] / d
    v = proj[:, 1] / d
    out = np.zeros((h, w), np.float32)
    ok = (u > 0) & (v > 0) & (u < w) & (v < h) & (d > min_d) & (d < max_d)
    order = np.argsort(-d)  # far first so near overwrites (min semantics)
    for i in np.nonzero(ok)[0][np.argsort(-d[ok], kind="stable")]:
        out[int(v[i]), int(u[i])] = d[i]
    return out


class TestProjection:
    def test_matches_numpy(self, rng):
        cfg = kitti_rgbl_config()
        # scale camera to the small test image
        K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]], np.float32)
        Tr = np.array(cfg.lidar.T_velo_cam, np.float32).reshape(3, 4)
        P = depth_ops.lidar_projection_matrix(K, Tr)
        pts = make_cloud(rng)
        ours = np.asarray(depth_ops.project_pointcloud(jnp.asarray(pts), jnp.asarray(P), H, W))
        ref = reference_projection(pts, P, H, W, 5.0, 200.0)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_distance_gating(self, rng):
        P = np.eye(3, 4, dtype=np.float32)
        P[0, 0] = P[1, 1] = 100.0
        P[0, 2] = W / 2
        P[1, 2] = H / 2
        P = np.ascontiguousarray(P)
        pts = np.array([[0.0, 0.0, 3.0], [0.0, 0.0, 50.0], [0.0, 0.0, 300.0]], np.float32)
        out = np.asarray(depth_ops.project_pointcloud(jnp.asarray(pts), jnp.asarray(P), H, W))
        assert (out > 0).sum() == 1
        assert abs(out[H // 2, W // 2] - 50.0) < 1e-4

    def test_collision_keeps_nearest(self):
        P = np.eye(3, 4, dtype=np.float32)
        P[0, 0] = P[1, 1] = 100.0
        P[0, 2] = W / 2
        P[1, 2] = H / 2
        pts = np.array([[0.0, 0.0, 80.0], [0.0, 0.0, 20.0], [0.0, 0.0, 60.0]], np.float32)
        out = np.asarray(depth_ops.project_pointcloud(jnp.asarray(pts), jnp.asarray(P), H, W))
        assert abs(out[H // 2, W // 2] - 20.0) < 1e-4

    def test_padding_mask(self, rng):
        P = np.eye(3, 4, dtype=np.float32)
        P[0, 0] = P[1, 1] = 100.0
        P[0, 2] = W / 2
        P[1, 2] = H / 2
        pts = np.array([[0.1, 0.1, 50.0], [0.1, 0.1, 30.0]], np.float32)
        mask = np.array([True, False])
        out = np.asarray(
            depth_ops.project_pointcloud(jnp.asarray(pts), jnp.asarray(P), H, W, valid_mask=jnp.asarray(mask))
        )
        vals = out[out > 0]
        assert len(vals) == 1 and abs(vals[0] - 50.0) < 1e-4


def sparse_map(rng, density=0.02, max_dist=200.0):
    m = np.zeros((H, W), np.float32)
    n = int(H * W * density)
    ys = rng.integers(0, H, n)
    xs = rng.integers(0, W, n)
    m[ys, xs] = rng.uniform(5.0, max_dist - 5.0, n).astype(np.float32)
    return m


class TestInverseDilation:
    def _cv_reference(self, raw, kernel, max_dist=200.0):
        inv = max_dist - raw
        _, inv = cv2.threshold(inv, max_dist - 1, 0, cv2.THRESH_TOZERO_INV)
        dil = cv2.dilate(inv, kernel.astype(np.uint8))
        out = max_dist - dil
        _, out = cv2.threshold(out, max_dist - 1, 0, cv2.THRESH_TOZERO_INV)
        return out

    def test_matches_opencv_diamond5(self, rng):
        raw = sparse_map(rng)
        kernel = depth_ops.structuring_element("Diamond", 5, 5)
        ours = np.asarray(depth_ops.upsample_inverse_dilation(jnp.asarray(raw), 200.0, "Diamond", 5, 7))
        ref = self._cv_reference(raw, kernel)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_matches_opencv_rect(self, rng):
        raw = sparse_map(rng)
        kernel = np.ones((7, 5), np.uint8)  # cv size (w=5, h=7)
        ours = np.asarray(depth_ops.upsample_inverse_dilation(jnp.asarray(raw), 200.0, "Rectangle", 5, 7))
        ref = self._cv_reference(raw, cv2.getStructuringElement(cv2.MORPH_RECT, (5, 7)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_empty_stays_empty(self):
        raw = np.zeros((H, W), np.float32)
        out = np.asarray(depth_ops.upsample_inverse_dilation(jnp.asarray(raw)))
        assert (out == 0).all()


class TestAverageFiltering:
    def test_matches_numpy(self, rng):
        raw = sparse_map(rng)
        ours = np.asarray(
            depth_ops.upsample_average_filtering(jnp.asarray(raw), kernel_size=5, pre_dilate=False)
        )
        # numpy reference: box sum / occupancy count
        k = np.ones((5, 5), np.float32)
        s = cv2.filter2D(raw, -1, k, borderType=cv2.BORDER_CONSTANT)
        n = cv2.filter2D((raw > 0).astype(np.float32), -1, k, borderType=cv2.BORDER_CONSTANT)
        ref = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


class TestNearestNeighbor:
    def test_exact_pixels_pass_through(self, rng):
        # isolated occupied pixels (the radius-0 window is 2×2, matching the
        # reference's Rect arithmetic, so neighbors must be empty for
        # exact pass-through)
        raw = np.zeros((H, W), np.float32)
        ys = np.arange(8, H - 8, 8)
        xs = np.arange(8, W - 8, 16)[: len(ys)]
        vals = rng.uniform(6, 190, len(ys)).astype(np.float32)
        raw[ys, xs] = vals
        kp = np.stack([xs, ys], axis=1).astype(np.float32)
        d = np.asarray(depth_ops.nearest_neighbor_depth_at_keypoints(jnp.asarray(raw), jnp.asarray(kp)))
        np.testing.assert_allclose(d, vals, atol=1e-4)

    def test_far_from_any_point_gives_zero(self):
        raw = np.zeros((H, W), np.float32)
        raw[10, 10] = 50.0
        kp = np.array([[200.0, 80.0]], np.float32)
        d = np.asarray(depth_ops.nearest_neighbor_depth_at_keypoints(jnp.asarray(raw), jnp.asarray(kp)))
        assert d[0] == 0.0

    def test_nearby_keypoint_finds_depth(self):
        raw = np.zeros((H, W), np.float32)
        raw[40, 100] = 77.0
        kp = np.array([[103.0, 42.0]], np.float32)  # ~3.6 px away
        d = np.asarray(depth_ops.nearest_neighbor_depth_at_keypoints(jnp.asarray(raw), jnp.asarray(kp)))
        assert abs(d[0] - 77.0) < 1e-4


class TestFeatureDepth:
    def test_sampling_and_pseudo_stereo(self):
        dm = np.zeros((H, W), np.float32)
        dm[20, 30] = 10.0
        kp = np.array([[30.4, 20.7], [50.0, 50.0]], np.float32)
        d, ur = depth_ops.feature_depth(jnp.asarray(dm), jnp.asarray(kp), jnp.asarray(kp), 100.0)
        d, ur = np.asarray(d), np.asarray(ur)
        assert abs(d[0] - 10.0) < 1e-5
        assert abs(ur[0] - (30.4 - 100.0 / 10.0)) < 1e-4
        assert d[1] == -1.0 and ur[1] == -1.0
