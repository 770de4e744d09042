"""KITTI sequence publisher — replays a KITTI odometry sequence as
timestamped image + pointcloud streams into an :class:`OnlineSlamNode`
(or any feed callback), at real-time or accelerated rate.

Equivalent of the reference's ``ros2/kitti_odometry_publisher`` (rclpy
timer-driven image/pointcloud publishers) without the ROS transport: the
"topics" are the node's ``feed_rgb``/``feed_cloud`` methods, which is
exactly what the reference's subscriber callbacks forward into
(``rgbd-slam-node.cpp:52``).

Usage:
  python tools/kitti_publisher.py <settings.yaml> <sequence_dir> \
      [--rate 1.0] [--frames N] [--out traj.txt]
"""

from __future__ import annotations

import argparse
import sys
import time


def publish(seq_dir: str, node, rate: float = 1.0, frames: int = 0,
            log=lambda *a: print(*a, file=sys.stderr)):
    """Stream the sequence into ``node`` honoring times.txt pacing
    (rate > 1 plays faster; rate <= 0 streams as fast as possible)."""
    from orb_slam3_rgbl_tpu.io import kitti

    seq = kitti.KittiSequence(seq_dir)
    n = len(seq) if frames <= 0 else min(frames, len(seq))
    t_start = time.perf_counter()
    for i in range(n):
        t = float(seq.times[i])
        if rate > 0:
            target = t_start + t / rate
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        gray, cloud, _mask, t = seq.frame(i)
        node.feed_rgb(t, gray)
        if cloud is not None:
            node.feed_cloud(t, cloud)
        if i and i % 50 == 0:
            log(f"published {i}/{n} frames")
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--rate", type=float, default=1.0,
                    help="playback speed multiple (0 = as fast as possible)")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--out", default="CameraTrajectory.txt")
    args = ap.parse_args()

    from orb_slam3_rgbl_tpu.config import load_config
    from orb_slam3_rgbl_tpu.io.online import OnlineSlamNode
    from orb_slam3_rgbl_tpu.slam.system import System

    cfg = load_config(args.settings)
    system = System(cfg)
    poses = []
    node = OnlineSlamNode(system, mode="rgbl",
                          on_pose=lambda t, r: poses.append((t, r)))
    n = publish(args.sequence, node, rate=args.rate, frames=args.frames)
    node.stop()
    system.shutdown()
    system.save_trajectory_kitti(args.out)
    print(f"published {n} frames, tracked {len(poses)}, "
          f"dropped {node.dropped_frames()}; trajectory -> {args.out}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
