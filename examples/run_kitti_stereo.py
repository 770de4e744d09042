#!/usr/bin/env python3
"""KITTI stereo driver — mirror of the reference ``stereo_kitti`` example
(``Examples/Stereo/stereo_kitti.cc``): rectified image_0/image_1 pairs in,
``CameraTrajectory.txt`` (KITTI format) out.

Usage:
    python examples/run_kitti_stereo.py <settings.yaml> <sequence_dir> \
        [--out CameraTrajectory.txt] [--frames N]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--frames", type=int, default=0)
    args = ap.parse_args()

    from orb_slam3_rgbl_tpu.config import load_config, STEREO
    from orb_slam3_rgbl_tpu.io.kitti import load_times, list_images, load_image_gray
    from orb_slam3_rgbl_tpu.slam.system import System

    cfg = load_config(args.settings, sensor=STEREO)
    slam = System(cfg)

    times_f = load_times(args.sequence)
    left = list_images(args.sequence, "image_0")
    right = list_images(args.sequence, "image_1")
    n = min(len(left), len(right))
    if args.frames > 0:
        n = min(n, args.frames)

    times = []
    for i in range(n):
        im_l = load_image_gray(left[i])
        im_r = load_image_gray(right[i])
        t0 = time.perf_counter()
        res = slam.track_stereo(im_l, im_r, float(times_f[i]))
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"[{i}/{n}] state={res.state} inliers={res.n_inliers}", file=sys.stderr)

    arr = np.asarray(times)
    print(f"median tracking time: {np.median(arr):.4f}", file=sys.stderr)
    print(f"mean tracking time: {arr.mean():.4f}", file=sys.stderr)
    slam.save_trajectory_kitti(args.out)
    print(f"trajectory saved to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
