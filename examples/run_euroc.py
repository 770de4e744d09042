#!/usr/bin/env python3
"""EuRoC / TUM-VI driver — mirror of the reference
``mono_euroc`` / ``mono_inertial_euroc`` / ``stereo_inertial_euroc``
examples (``Examples/Monocular{,-Inertial}/``): ASL-format sequence in,
TUM + EuRoC-format trajectories out.

Usage:
    python examples/run_euroc.py <settings.yaml> <mav_dir> \
        [--mode mono|stereo|mono-inertial|stereo-inertial] \
        [--timestamps EuRoC_TimeStamps/MH01.txt] [--frames N] \
        [--out-tum f_dataset.txt] [--out-kf kf_dataset.txt]
"""

import argparse
import sys
import time

import numpy as np

MODES = {
    "mono": ("MONOCULAR", False, False),
    "stereo": ("STEREO", True, False),
    "mono-inertial": ("IMU_MONOCULAR", False, True),
    "stereo-inertial": ("IMU_STEREO", True, True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("mav_dir")
    ap.add_argument("--mode", default="mono", choices=sorted(MODES))
    ap.add_argument("--timestamps", default="")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--out-tum", default="f_dataset.txt")
    ap.add_argument("--out-kf", default="kf_dataset.txt")
    args = ap.parse_args()

    from orb_slam3_rgbl_tpu import config as cfg_mod
    from orb_slam3_rgbl_tpu.io.euroc import EurocSequence
    from orb_slam3_rgbl_tpu.slam.system import System

    sensor_name, stereo, inertial = MODES[args.mode]
    sensor = getattr(cfg_mod, sensor_name)
    cfg = cfg_mod.load_config(args.settings, sensor=sensor)
    slam = System(cfg)

    seq = EurocSequence(args.mav_dir, stereo=stereo, inertial=inertial,
                        timestamps_file=args.timestamps or None)
    n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))

    times = []
    for i in range(n):
        fr = seq.frame(i)
        t0 = time.perf_counter()
        if stereo:
            im_l, im_r, imu, t = fr
            res = slam.track_stereo(im_l, im_r, t, imu=imu)
        else:
            img, imu, t = fr
            res = slam.track_monocular(img, t, imu=imu)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            print(f"[{i}/{n}] state={res.state} inliers={res.n_inliers}", file=sys.stderr)

    arr = np.asarray(times)
    print(f"median tracking time: {np.median(arr):.4f}", file=sys.stderr)
    print(f"mean tracking time: {arr.mean():.4f}", file=sys.stderr)
    slam.save_trajectory_tum(args.out_tum)
    slam.save_keyframe_trajectory_tum(args.out_kf)
    slam.save_trajectory_euroc(args.out_tum.replace(".txt", "_euroc.txt"))
    print(f"trajectories saved to {args.out_tum} / {args.out_kf}", file=sys.stderr)


if __name__ == "__main__":
    main()
