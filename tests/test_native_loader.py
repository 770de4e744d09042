"""Native prefetcher test: build a tiny fake KITTI sequence on disk and
check frames arrive in order with correct contents + padding."""

import os

import numpy as np
import cv2
import pytest


def make_fake_sequence(tmp_path, n_frames=6, h=48, w=64, n_pts=500):
    seq = tmp_path / "seq"
    (seq / "image_2").mkdir(parents=True)
    (seq / "velodyne").mkdir()
    rng = np.random.default_rng(0)
    imgs, clouds = [], []
    with open(seq / "times.txt", "w") as f:
        for i in range(n_frames):
            f.write(f"{i * 0.1:.6f}\n")
    for i in range(n_frames):
        img = rng.integers(0, 255, (h, w), dtype=np.uint8)
        cv2.imwrite(str(seq / "image_2" / f"{i:06d}.png"), img)
        pts = rng.uniform(-10, 10, (n_pts, 4)).astype(np.float32)
        pts.tofile(str(seq / "velodyne" / f"{i:06d}.bin"))
        imgs.append(img)
        clouds.append(pts)
    return str(seq), imgs, clouds


class TestNativeLoader:
    def test_in_order_prefetch(self, tmp_path):
        from orb_slam3_rgbl_tpu.io.native_loader import NativeKittiSequence

        seq_dir, imgs, clouds = make_fake_sequence(tmp_path)
        loader = NativeKittiSequence(seq_dir, max_points=1024, n_threads=2)
        assert len(loader) == 6
        assert loader.height == 48 and loader.width == 64
        for i in range(6):
            out = loader.next_frame()
            assert out is not None, i
            img, cloud, mask, t = out
            np.testing.assert_allclose(img, imgs[i].astype(np.float32))
            assert abs(t - i * 0.1) < 1e-9
            assert mask.sum() == 500
            np.testing.assert_allclose(cloud[:500], clouds[i])
            assert (cloud[500:] == 0).all()
        assert loader.next_frame() is None
        loader.close()

    def test_truncation_keeps_near_points(self, tmp_path):
        from orb_slam3_rgbl_tpu.io.native_loader import NativeKittiSequence

        seq_dir, imgs, clouds = make_fake_sequence(tmp_path, n_frames=1, n_pts=800)
        loader = NativeKittiSequence(seq_dir, max_points=100)
        img, cloud, mask, t = loader.next_frame()
        assert mask.sum() == 100
        d2_kept = np.einsum("ij,ij->i", cloud[:100, :3], cloud[:100, :3])
        d2_all = np.sort(np.einsum("ij,ij->i", clouds[0][:, :3], clouds[0][:, :3]))
        assert d2_kept.max() <= d2_all[100] + 1e-4
        loader.close()

    def test_python_fallback_matches(self, tmp_path):
        from orb_slam3_rgbl_tpu.io.native_loader import NativeKittiSequence
        from orb_slam3_rgbl_tpu.io.kitti import KittiSequence

        seq_dir, *_ = make_fake_sequence(tmp_path, n_frames=3)
        nat = NativeKittiSequence(seq_dir, max_points=1024)
        py = KittiSequence(seq_dir, max_points=1024)
        for i in range(3):
            img_n, cloud_n, mask_n, t_n = nat.next_frame()
            img_p, cloud_p, mask_p, t_p = py.frame(i)
            np.testing.assert_allclose(img_n, img_p)
            np.testing.assert_allclose(cloud_n, cloud_p)
            np.testing.assert_array_equal(mask_n, mask_p)
            assert abs(t_n - t_p) < 1e-9
        nat.close()


class TestKittiPublisher:
    def test_replays_sequence_into_node(self, tmp_path):
        """tools/kitti_publisher.py (the ROS2 kitti_odometry_publisher
        analog) streams a sequence into the online node at full speed."""
        import sys as _sys, os as _os
        _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
        from tools.kitti_publisher import publish

        seq_dir, imgs, clouds = make_fake_sequence(tmp_path, n_frames=4)

        class SpyNode:
            def __init__(self):
                self.rgb, self.cloud = [], []

            def feed_rgb(self, t, gray):
                self.rgb.append((t, gray.shape))

            def feed_cloud(self, t, cloud):
                self.cloud.append((t, cloud.shape))

        node = SpyNode()
        n = publish(str(seq_dir), node, rate=0.0, log=lambda *a: None)
        assert n == 4
        assert len(node.rgb) == 4 and len(node.cloud) == 4
        assert node.rgb[0][1] == (48, 64)
