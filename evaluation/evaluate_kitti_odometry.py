#!/usr/bin/env python3
"""KITTI odometry metrics — equivalent of the external ``kitti-odom-eval``
tool the reference points to (``Examples/Readme.md:24``): average
translational error (%) and rotational error (deg/100m) over all
subsequences of length 100..800 m, plus ATE RMSE.

Usage:
    python evaluation/evaluate_kitti_odometry.py <gt_poses.txt> <est_poses.txt>
"""

import argparse

import numpy as np

LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


def load_poses(path: str) -> np.ndarray:
    """KITTI 3x4-per-line → (F, 4, 4)."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    M = np.tile(np.eye(4), (len(rows), 1, 1))
    M[:, :3, :] = rows
    return M


def trajectory_distances(poses: np.ndarray) -> np.ndarray:
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(d)])


def rotation_error(R: np.ndarray) -> float:
    return float(np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)))


def last_frame_from_len(dist: np.ndarray, first: int, length: float) -> int:
    target = dist[first] + length
    j = int(np.searchsorted(dist, target))
    return j if j < len(dist) else -1


def calc_sequence_errors(gt: np.ndarray, est: np.ndarray, step: int = 10):
    """Per-(start, length) relative errors, KITTI devkit semantics."""
    dist = trajectory_distances(gt)
    errors = []
    for first in range(0, len(gt), step):
        for length in LENGTHS:
            last = last_frame_from_len(dist, first, length)
            if last < 0:
                continue
            dgt = np.linalg.inv(gt[first]) @ gt[last]
            dest = np.linalg.inv(est[first]) @ est[last]
            err = np.linalg.inv(dest) @ dgt
            t_err = np.linalg.norm(err[:3, 3]) / length
            r_err = rotation_error(err[:3, :3]) / length
            errors.append((first, length, t_err, r_err))
    return errors


def ate_rmse(gt: np.ndarray, est: np.ndarray) -> float:
    """Horn-aligned absolute trajectory error RMSE."""
    g, e = gt[:, :3, 3], est[:, :3, 3]
    gm, em = g.mean(0), e.mean(0)
    H = (e - em).T @ (g - gm)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    t = gm - R @ em
    res = (R @ e.T).T + t - g
    return float(np.sqrt((res ** 2).sum(1).mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gt")
    ap.add_argument("est")
    ap.add_argument("--step", type=int, default=10,
                    help="subsequence start stride in frames (devkit: 10)")
    args = ap.parse_args()

    gt, est = load_poses(args.gt), load_poses(args.est)
    n = min(len(gt), len(est))
    gt, est = gt[:n], est[:n]

    errs = calc_sequence_errors(gt, est, step=args.step)
    print(f"frames: {n}")
    if errs:
        t_rel = np.mean([e[2] for e in errs]) * 100.0
        r_rel = np.degrees(np.mean([e[3] for e in errs])) * 100.0
        print(f"t_rel_percent: {t_rel:.4f}")
        print(f"r_rel_deg_per_100m: {r_rel:.4f}")
    else:
        print("t_rel_percent: nan (trajectory shorter than 100 m)")
    print(f"ate_rmse_m: {ate_rmse(gt, est):.6f}")


if __name__ == "__main__":
    main()
