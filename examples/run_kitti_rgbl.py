#!/usr/bin/env python3
"""KITTI RGB-L driver — mirror of the reference `rgbl_kitti` example
(``Examples/RGB-L/rgbl_kitti.cc``): run a sequence, print per-frame
timing stats (median/mean as the reference does at ``:135-144``), save
``CameraTrajectory.txt`` in KITTI format.

Usage:
    python examples/run_kitti_rgbl.py <settings.yaml> <sequence_dir> \
        [--out CameraTrajectory.txt] [--frames N] [--native-loader]
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
    ap.add_argument("--native-loader", action="store_true")
    ap.add_argument("--viz", default="", help="write a map plot to this path at the end")
    ap.add_argument("--stats", default="", help="write per-stage timing stats (ExecMean-style)")
    ap.add_argument("--async-mapping", action="store_true",
                    help="run mapping/loop closing on the worker plane")
    args = ap.parse_args()

    from orb_slam3_rgbl_tpu.config import load_config, RGBL
    from orb_slam3_rgbl_tpu.slam.system import System
    from orb_slam3_rgbl_tpu.utils.profiling import StageTimer

    cfg = load_config(args.settings, sensor=RGBL)
    slam = System(cfg)
    timer = StageTimer()
    slam.timer = timer
    slam.async_mapping = bool(args.async_mapping)

    if args.native_loader:
        from orb_slam3_rgbl_tpu.io.native_loader import NativeKittiSequence

        seq = NativeKittiSequence(args.sequence)
        n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))
        frames = (seq.next_frame() for _ in range(n))
    else:
        from orb_slam3_rgbl_tpu.io.kitti import KittiSequence

        seq = KittiSequence(args.sequence)
        n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))
        frames = (seq.frame(i) for i in range(n))

    times = []
    for i, (img, pcd, mask, t) in enumerate(frames):
        t0 = time.perf_counter()
        res = slam.track_rgbl(img, pcd, t, cloud_mask=mask)
        dt = time.perf_counter() - t0
        times.append(dt)
        timer.record("track_total", dt)
        if i % 50 == 0:
            print(f"[{i}/{n}] state={res.state} inliers={res.n_inliers} {dt*1e3:.1f} ms",
                  file=sys.stderr)

    arr = np.asarray(times)
    # the reference prints exactly these two numbers (rgbl_kitti.cc:135-144)
    print(f"median tracking time: {np.median(arr):.4f}", file=sys.stderr)
    print(f"mean tracking time: {arr.mean():.4f}", file=sys.stderr)
    print(timer.report(), file=sys.stderr)

    slam.shutdown()
    slam.save_trajectory_kitti(args.out)
    print(f"trajectory saved to {args.out}", file=sys.stderr)
    if args.stats:
        from orb_slam3_rgbl_tpu.utils.profiling import save_stats

        save_stats(timer, args.stats)
    if args.viz:
        from orb_slam3_rgbl_tpu.viz.viewer import plot_map

        plot_map(slam.map, trajectory=slam.trajectory(), path=args.viz)


if __name__ == "__main__":
    main()
