#!/usr/bin/env python3
"""TUM RGB-D driver — mirror of the reference ``rgbd_tum`` example: runs
a TUM RGB-D sequence (rgb.txt/depth.txt association done inline, same
nearest-timestamp rule as ``evaluation/associate.py``), saves TUM-format
trajectories ready for ``evaluation/evaluate_ate.py``.

Usage:
    python examples/run_tum_rgbd.py <settings.yaml> <sequence_dir> \
        [--frames N] [--out CameraTrajectory.txt] [--out-kf KeyFrameTrajectory.txt]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--out-kf", default="KeyFrameTrajectory.txt")
    args = ap.parse_args()

    from orb_slam3_rgbl_tpu.config import load_config, RGBD
    from orb_slam3_rgbl_tpu.io.euroc import TumRgbdSequence
    from orb_slam3_rgbl_tpu.slam.system import System

    cfg = load_config(args.settings, sensor=RGBD)
    slam = System(cfg)
    seq = TumRgbdSequence(args.sequence, depth_factor=cfg.depth_map_factor)
    n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))

    times = []
    for i in range(n):
        img, depth, _, t = seq.frame(i)
        t0 = time.perf_counter()
        res = slam.track_rgbd(img, depth, t)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            print(f"[{i}/{n}] state={res.state} inliers={res.n_inliers}", file=sys.stderr)

    arr = np.asarray(times)
    print(f"median tracking time: {np.median(arr):.4f}", file=sys.stderr)
    print(f"mean tracking time: {arr.mean():.4f}", file=sys.stderr)
    slam.save_trajectory_tum(args.out)
    slam.save_keyframe_trajectory_tum(args.out_kf)
    print(f"trajectories saved to {args.out} / {args.out_kf}", file=sys.stderr)


if __name__ == "__main__":
    main()
