#!/usr/bin/env python3
"""ATE evaluation — mirror of the reference ``evaluation/evaluate_ate_scale.py``
(Horn alignment, optional scale) for KITTI-format trajectories.

Usage:
    python evaluation/evaluate_ate.py <gt_poses.txt> <est_poses.txt> [--scale]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gt")
    ap.add_argument("est")
    ap.add_argument("--scale", action="store_true", help="align with Sim3 (mono)")
    ap.add_argument("--rpe-delta", type=int, default=0, help="also print RPE at this frame delta")
    args = ap.parse_args()

    import jax.numpy as jnp
    from orb_slam3_rgbl_tpu.geometry import align
    from orb_slam3_rgbl_tpu.io.trajectory import load_kitti_poses

    gt = load_kitti_poses(args.gt)
    est = load_kitti_poses(args.est)
    n = min(len(gt), len(est))
    gt, est = gt[:n], est[:n]
    a = align.horn_align(jnp.asarray(est[:, 4:7]), jnp.asarray(gt[:, 4:7]), with_scale=args.scale)
    print(f"frames: {n}")
    print(f"ate_rmse_m: {float(a.rmse):.6f}")
    if args.scale:
        print(f"scale: {float(a.s):.6f}")
    if args.rpe_delta > 0:
        r = align.rpe_translation(jnp.asarray(gt), jnp.asarray(est), delta=args.rpe_delta)
        print(f"rpe_trans_m@{args.rpe_delta}: {float(r):.6f}")


if __name__ == "__main__":
    main()
