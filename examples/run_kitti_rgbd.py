#!/usr/bin/env python3
"""KITTI RGB-D driver — mirror of the reference ``rgbd_kitti`` /
``rgbd_kitti_map_saving`` / ``rgbd_kitti_map_loading`` examples
(``Examples/RGB-D/rgbd_kitti.cc``): run a sequence with pre-generated
depth PNGs (see ``tools/project_velodyne.py``), optionally save or load
the Atlas checkpoint, save ``CameraTrajectory.txt`` in KITTI format.

Usage:
    python examples/run_kitti_rgbd.py <settings.yaml> <sequence_dir> \
        [--depth-dir depth] [--out CameraTrajectory.txt] [--frames N] \
        [--save-atlas atlas.npz] [--load-atlas atlas.npz]
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--depth-dir", default="depth",
                    help="subdirectory with 16-bit depth PNGs")
    ap.add_argument("--depth-factor", type=float, default=0.0,
                    help="depth = png / factor (0: use settings DepthMapFactor)")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--save-atlas", default="",
                    help="write the Atlas checkpoint here at the end "
                         "(= SLAM.SaveAtlas, rgbd_kitti_map_saving.cc:145)")
    ap.add_argument("--load-atlas", default="",
                    help="resume from this Atlas checkpoint "
                         "(= rgbd_kitti_map_loading.cc)")
    args = ap.parse_args()

    import cv2
    from orb_slam3_rgbl_tpu.config import load_config, RGBD
    from orb_slam3_rgbl_tpu.io.kitti import load_times, list_images, load_image_gray
    from orb_slam3_rgbl_tpu.slam.system import System

    cfg = load_config(args.settings, sensor=RGBD)
    slam = System(cfg)
    if args.load_atlas:
        slam.load_atlas(args.load_atlas)

    times_f = load_times(args.sequence)
    images = list_images(args.sequence)
    ddir = os.path.join(args.sequence, args.depth_dir)
    depths = [os.path.join(ddir, f) for f in sorted(os.listdir(ddir)) if f.endswith(".png")]
    factor = args.depth_factor or cfg.depth_map_factor
    n = min(len(images), len(depths))
    if args.frames > 0:
        n = min(n, args.frames)

    times = []
    for i in range(n):
        img = load_image_gray(images[i])
        d16 = cv2.imread(depths[i], cv2.IMREAD_UNCHANGED)
        depth = d16.astype(np.float32) / factor
        t0 = time.perf_counter()
        res = slam.track_rgbd(img, depth, float(times_f[i]))
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"[{i}/{n}] state={res.state} inliers={res.n_inliers}", file=sys.stderr)

    arr = np.asarray(times)
    print(f"median tracking time: {np.median(arr):.4f}", file=sys.stderr)
    print(f"mean tracking time: {arr.mean():.4f}", file=sys.stderr)
    slam.save_trajectory_kitti(args.out)
    print(f"trajectory saved to {args.out}", file=sys.stderr)
    if args.save_atlas:
        slam.save_atlas(args.save_atlas)
        print(f"atlas saved to {args.save_atlas}", file=sys.stderr)


if __name__ == "__main__":
    main()
