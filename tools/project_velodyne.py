#!/usr/bin/env python3
"""Offline LiDAR→depth-map generator — equivalent of the reference
``tools/proj_velo2cam_kitti_odom.py`` (numpy projection, ``:28-75``) and
the ``ros2/depth_map_creator`` filters, but running the engine's own XLA
projection/upsampling kernels so the PNGs match the online RGB-L path
bit-for-bit.

Reads a KITTI odometry sequence (calib.txt P2·Tr), projects every
``velodyne/*.bin`` into the image_2 frame, optionally densifies, writes
16-bit depth PNGs (depth = png / factor) consumable by the RGB-D mode
(``examples/run_kitti_rgbd.py``).

Usage:
    python tools/project_velodyne.py <sequence_dir> [--out-dir depth] \
        [--method None|InverseDilation|AverageFiltering] [--factor 256] \
        [--frames N] [--min-dist 5] [--max-dist 200]
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--out-dir", default="depth")
    ap.add_argument("--method", default="None",
                    choices=["None", "InverseDilation", "AverageFiltering"])
    ap.add_argument("--factor", type=float, default=256.0,
                    help="png value = depth * factor (KITTI depth convention)")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--min-dist", type=float, default=5.0)
    ap.add_argument("--max-dist", type=float, default=200.0)
    ap.add_argument("--camera", default="P2", help="calib projection to use")
    args = ap.parse_args()

    import cv2
    import numpy as np
    import jax.numpy as jnp
    from orb_slam3_rgbl_tpu.io import kitti
    from orb_slam3_rgbl_tpu.ops import depth as depth_ops

    calib = kitti.load_calib(args.sequence)
    P_cam, Tr = calib[args.camera], calib["Tr"]
    # P = P_cam(3x4) · [Tr; 0 0 0 1] — same composition as the reference tool
    Tr44 = np.eye(4)
    Tr44[:3, :] = Tr
    P = (P_cam @ Tr44).astype(np.float32)

    images = kitti.list_images(args.sequence)
    clouds = kitti.list_velodyne(args.sequence)
    probe = cv2.imread(images[0], cv2.IMREAD_GRAYSCALE)
    H, W = probe.shape

    out_dir = os.path.join(args.sequence, args.out_dir)
    os.makedirs(out_dir, exist_ok=True)
    n = min(len(images), len(clouds))
    if args.frames > 0:
        n = min(n, args.frames)

    for i in range(n):
        pts, mask = kitti.load_pointcloud(clouds[i], max_points=131072)
        raw = depth_ops.project_pointcloud(
            jnp.asarray(pts), jnp.asarray(P), H, W,
            args.min_dist, args.max_dist, jnp.asarray(mask),
        )
        if args.method == "InverseDilation":
            dense = depth_ops.upsample_inverse_dilation(raw, args.max_dist, "Diamond", 5, 7)
        elif args.method == "AverageFiltering":
            dense = depth_ops.upsample_average_filtering(raw, 5, True, "Diamond", 3, args.max_dist)
        else:
            dense = raw
        png = np.clip(np.asarray(dense) * args.factor, 0, 65535).astype(np.uint16)
        name = os.path.splitext(os.path.basename(clouds[i]))[0] + ".png"
        cv2.imwrite(os.path.join(out_dir, name), png)
        if i % 100 == 0:
            print(f"[{i}/{n}] {name}", file=sys.stderr)

    print(f"wrote {n} depth maps to {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
