"""Monocular pipeline tests: two-view initialization inside the tracker,
scale-free map bootstrap, tracking + triangulation-only mapping (no depth
channel), Sim3-aligned ATE. Mirrors the reference mono path
(``Tracking::MonocularInitialization`` / ``CreateInitialMapMonocular``,
``Tracking.cc:2483-2695``)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config, MONOCULAR
from orb_slam3_rgbl_tpu.geometry import lie, align
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

from synthetic_world import SyntheticWorld


def run_mono(rng, n_frames=60, step=0.8, yaw_rate=0.0, n_feat=600):
    cfg = kitti_rgbl_config(sensor=MONOCULAR)
    world = SyntheticWorld(rng, cam=cfg.camera, length=n_frames * step)
    gt = world.trajectory(n_frames, step=step, yaw_rate=yaw_rate)
    sys = System(cfg)
    results = []
    for i in range(n_frames):
        feats = world.render(gt[i], n_feat=n_feat, depth_frac=0.0)
        results.append(sys.track_features(feats, timestamp=i * 0.1))
    return sys, gt, results


class TestMonocular:
    def test_initializes_and_tracks(self, rng):
        sys, gt, results = run_mono(rng, n_frames=50)
        states = [r.state for r in results]
        assert trk.OK in states, [trk.STATE_NAMES[s] for s in states]
        first_ok = states.index(trk.OK)
        # two-view init needs some baseline, but not half the sequence
        assert first_ok <= 12, first_ok
        assert all(s == trk.OK for s in states[first_ok:]), \
            [trk.STATE_NAMES[s] for s in states]

        # mono is up-to-scale: evaluate with Sim3 (scaled Horn) alignment
        est = sys.trajectory()
        lost = np.array(sys.tracker.traj_lost)
        gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        sel = ~lost
        assert sel.sum() >= len(results) - first_ok
        err = float(align.ate_rmse(
            jnp.asarray(gt_twc[sel, 4:7]), jnp.asarray(est[sel, 4:7]), with_scale=True
        ))
        # 40 m trajectory, exact-descriptor matching: sub-meter after scale
        # alignment
        assert err < 1.0, err

    def test_map_grows_by_triangulation_only(self, rng):
        sys, gt, results = run_mono(rng, n_frames=40)
        # no depth channel: every landmark beyond the init set must come
        # from epipolar triangulation in local mapping
        assert sys.map.n_kf >= 3, sys.map.n_kf
        assert sys.map.n_lm > 300, sys.map.n_lm
        # the initial map is gauge-normalized: median depth of the first
        # keyframe's landmarks ≈ 1 before BA rescales — just require a
        # sane (non-metric) scale well below the true metric depths
        lm0 = sys.map.kf_lm_idx[0]
        lm0 = lm0[lm0 >= 0]
        if lm0.size:
            med = np.median(np.linalg.norm(sys.map.lm_pos[lm0], axis=-1))
            assert med < 10.0, med

    def test_mono_features_have_no_depth(self, rng):
        sys, gt, results = run_mono(rng, n_frames=30)
        # pseudo-stereo columns absent everywhere in the stored keyframes
        assert (sys.map.kf_ur[sys.map.kf_valid] < 0).all()
