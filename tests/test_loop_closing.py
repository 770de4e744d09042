"""Loop-closing integration test: a circular trajectory revisiting its
start must fire a verified loop event and keep/improve trajectory quality."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie, align
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

from synthetic_world import SyntheticWorld


def circle_trajectory(n_frames: int, radius: float):
    """Camera drives a circle in the xz-plane (KITTI convention: z
    forward, x right), returning to the start. Returns (F, 7) Tcw."""
    poses = []
    for i in range(n_frames):
        phi = 2 * np.pi * i / (n_frames - 8)  # finish the circle early → overlap
        p = np.array([radius * (1 - np.cos(phi)), 0.0, radius * np.sin(phi)], np.float32)
        # camera z-axis along the tangent (sin phi, 0, cos phi): rotation
        # about +y by phi
        q = np.array([np.cos(phi / 2), 0.0, np.sin(phi / 2), 0.0], np.float32)
        Twc = np.concatenate([q, p])
        poses.append(np.asarray(lie.se3_inv(jnp.asarray(Twc)), np.float32))
    return np.stack(poses)


class CircularWorld(SyntheticWorld):
    def __init__(self, rng, cam, radius, n_landmarks=6000):
        self.rng = rng
        self.cam = cam
        # landmarks scattered around the circular corridor
        phi = rng.uniform(0, 2 * np.pi, n_landmarks)
        r = radius + rng.uniform(-18, 18, n_landmarks)
        self.points = np.stack(
            [
                radius - r * np.cos(phi) + rng.normal(0, 2, n_landmarks),
                rng.uniform(-6, 6, n_landmarks),
                r * np.sin(phi) + rng.normal(0, 2, n_landmarks),
            ],
            axis=1,
        ).astype(np.float32)
        self.desc = rng.integers(0, 2**32, size=(n_landmarks, 8), dtype=np.uint32)


def run_loop_sequence(rng, loop_closing=True, n_frames=90, radius=18.0, px_noise=0.6):
    import dataclasses
    cfg = dataclasses.replace(kitti_rgbl_config(), loop_closing=loop_closing)
    world = CircularWorld(rng, cfg.camera, radius)
    gt = circle_trajectory(n_frames, radius)
    sys = System(cfg)
    results = [
        sys.track_features(world.render(gt[i], n_feat=600, px_noise=px_noise), i * 0.1)
        for i in range(n_frames)
    ]
    return sys, gt, results


class TestLoopClosing:
    def test_loop_detected_on_revisit(self, rng):
        sys, gt, results = run_loop_sequence(rng)
        ok = [r.state == trk.OK for r in results]
        assert np.mean(ok) > 0.9, np.mean(ok)
        assert sys.loop_closer is not None
        assert len(sys.loop_closer.events) >= 1, "no loop detected on revisit"
        ev = sys.loop_closer.events[0]
        # loop connects a late keyframe to an early one
        assert sys.map.kf_frame_id[ev.kf_cur] - sys.map.kf_frame_id[ev.kf_matched] > 30

    def test_trajectory_quality_after_loop(self, rng):
        sys, gt, results = run_loop_sequence(rng)
        est = sys.trajectory()
        gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        err = float(align.ate_rmse(jnp.asarray(gt_twc[:, 4:7]), jnp.asarray(est[:, 4:7])))
        assert err < 0.5, err

    def test_no_false_loops_on_straight_path(self, rng):
        from test_slam_e2e import run_sequence
        sys, gt, results = run_sequence(rng, n_frames=60)
        if sys.loop_closer is not None:
            assert len(sys.loop_closer.events) == 0
