"""Trajectory writers matching the reference output formats exactly.

* KITTI: one 3×4 row-major ``Twc`` matrix per line
  (``System::SaveTrajectoryKITTI``, reference ``System.cc:1348-1405``).
* TUM: ``timestamp tx ty tz qx qy qz qw``
  (``System::SaveTrajectoryTUM``, ``System.cc:711``).
* EuRoC: ``timestamp_ns tx ty tz qx qy qz qw`` (space-separated)
  (``System::SaveTrajectoryEuRoC``, ``System.cc:904-911``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie


def save_kitti(path: str, poses_twc: np.ndarray):
    """(F, 7) world-frame SE3 → KITTI 3×4 text rows."""
    M = np.asarray(lie.se3_to_matrix(jnp.asarray(poses_twc)))
    with open(path, "w") as f:
        for m in M:
            row = m[:3, :].reshape(-1)
            f.write(" ".join(f"{x:.9e}" for x in row) + "\n")


def save_tum(path: str, timestamps, poses_twc: np.ndarray):
    with open(path, "w") as f:
        for t, T in zip(timestamps, poses_twc):
            qw, qx, qy, qz, tx, ty, tz = T
            f.write(f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} {qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")


def save_euroc(path: str, timestamps, poses_twc: np.ndarray):
    with open(path, "w") as f:
        for t, T in zip(timestamps, poses_twc):
            qw, qx, qy, qz, tx, ty, tz = T
            f.write(
                f"{t * 1e9:.6f} {tx:.9f} {ty:.9f} {tz:.9f}"
                f" {qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}\n"
            )


def load_kitti_poses(path: str) -> np.ndarray:
    """KITTI ground-truth ``poses/XX.txt`` → (F, 7) SE3 Twc."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    M = np.concatenate(
        [rows, np.tile(np.array([[[0.0, 0, 0, 1]]]), (rows.shape[0], 1, 1))], axis=1
    )
    return np.asarray(lie.se3_from_matrix(jnp.asarray(M)), np.float32)
