"""Visual-inertial SLAM end-to-end tests (feature-level): IMU wiring,
3-stage initialization with gravity alignment, VI tracking, and
monocular-inertial metric-scale recovery."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import (
    kitti_rgbl_config, ImuConfig, IMU_RGBD, IMU_MONOCULAR,
)
from orb_slam3_rgbl_tpu.geometry import lie, align
from orb_slam3_rgbl_tpu.imu import preintegration as pre
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

from synthetic_world import SyntheticWorld

G = np.array([0.0, 0.0, -pre.GRAVITY])
IMU_HZ = 100
FRAME_DT = 0.1


def simulate_vi_sequence(rng, n_frames, tilt_deg=12.0):
    """Body (=camera) trajectory with time-varying acceleration, mild
    rotation, and gravity TILTED in the visual world frame — the IMU init
    must discover the tilt and re-align the map. Returns (gt_Tcw (F, 7),
    imu_blocks list of (S, 7), vel_gt (F, 3), g_world)."""
    from scipy.spatial.transform import Rotation

    tilt = Rotation.from_rotvec(np.deg2rad(tilt_deg) * np.array([1.0, 0, 0]))
    g_world = tilt.apply(G)

    R = np.eye(3)
    v = np.array([0.15, 0.0, 1.2])
    p = np.zeros(3)
    dt = 1.0 / IMU_HZ
    t = 0.0
    gt, blocks, vels = [], [], []
    for f in range(n_frames):
        Twb = np.concatenate([
            Rotation.from_matrix(R).as_quat()[[3, 0, 1, 2]], p,
        ]).astype(np.float32)
        gt.append(np.asarray(lie.se3_inv(jnp.asarray(Twb)), np.float32))
        vels.append(v.copy())
        samples = []
        for k in range(int(FRAME_DT * IMU_HZ)):
            # world acceleration: smooth sinusoid (observability for scale)
            a_w = np.array([
                0.8 * np.sin(2.1 * t), 0.5 * np.cos(1.7 * t), 0.6 * np.sin(1.3 * t),
            ])
            omega_b = np.array([0.02 * np.sin(0.9 * t), 0.05, 0.03 * np.cos(1.1 * t)])
            acc_meas = R.T @ (a_w - g_world)
            samples.append(np.concatenate([[t], acc_meas, omega_b]))
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ Rotation.from_rotvec(omega_b * dt).as_matrix()
            t += dt
        blocks.append(np.array(samples, np.float32))
    return np.stack(gt), blocks, np.stack(vels), g_world


def aligned_ate(sys, gt, with_scale):
    est = sys.trajectory()
    lost = np.asarray(sys.tracker.traj_lost)
    ok = ~lost
    gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
    return float(align.ate_rmse(
        jnp.asarray(gt_twc[ok, 4:7]), jnp.asarray(est[ok, 4:7]), with_scale=with_scale,
    ))


class TestInertialRgbd:
    def test_init_and_track(self, rng):
        cfg = dataclasses.replace(
            kitti_rgbl_config(sensor=IMU_RGBD), imu=ImuConfig(),
            loop_closing=False,
        )
        n = 40
        gt, imu_blocks, vel_gt, g_world = simulate_vi_sequence(rng, n)
        world = SyntheticWorld(rng, cam=cfg.camera, length=60.0)
        sys = System(cfg)
        states = []
        for i in range(n):
            feats = world.render(gt[i])
            r = sys.track_features(feats, i * FRAME_DT,
                                   imu=None if i == 0 else imu_blocks[i - 1])
            states.append(r.state)
        assert all(s == trk.OK for s in states), [trk.STATE_NAMES[s] for s in states]
        assert sys.map.imu_initialized, "IMU never initialized"
        # gravity alignment: the init rotated the map so that the tilted
        # true gravity is now −z. Verify via a keyframe's world frame:
        # transforming the ORIGINAL gravity direction with the applied
        # rotation must give −z ⇒ aligned ATE must stay small.
        err = aligned_ate(sys, gt, with_scale=True)
        assert err < 0.5, err
        # the VI tracker's velocity should match GT magnitude (both metric)
        v_est = np.linalg.norm(sys.tracker.cur_vel)
        v_true = np.linalg.norm(vel_gt[-1])
        assert abs(v_est - v_true) / v_true < 0.3, (v_est, v_true)

    def test_imu_chain_recorded(self, rng):
        cfg = dataclasses.replace(
            kitti_rgbl_config(sensor=IMU_RGBD), imu=ImuConfig(), loop_closing=False,
        )
        n = 14
        gt, imu_blocks, _, _ = simulate_vi_sequence(rng, n)
        world = SyntheticWorld(rng, cam=cfg.camera, length=40.0)
        sys = System(cfg)
        for i in range(n):
            feats = world.render(gt[i])
            sys.track_features(feats, i * FRAME_DT,
                               imu=None if i == 0 else imu_blocks[i - 1])
        m = sys.map
        kfs = m.valid_kf_ids()
        # every non-first keyframe carries a preintegration to its
        # predecessor (the reference's mpImuPreintegrated / mPrevKF chain)
        for a, b in zip(kfs[:-1], kfs[1:]):
            assert int(m.kf_prev_imu[b]) == int(a)
            assert int(b) in m.imu_preint
            dt = float(m.imu_preint[int(b)][0])
            want = float(m.kf_timestamp[b] - m.kf_timestamp[a])
            assert abs(dt - want) < 0.05, (dt, want)


class TestInertialMonocular:
    def test_scale_recovery(self, rng):
        """Monocular-inertial: the visual map initializes at an arbitrary
        scale; after IMU init the trajectory must be METRIC — ATE against
        ground truth WITHOUT scale alignment must be small."""
        cfg = dataclasses.replace(
            kitti_rgbl_config(sensor=IMU_MONOCULAR), imu=ImuConfig(),
            loop_closing=False,
        )
        n = 45
        gt, imu_blocks, _, _ = simulate_vi_sequence(rng, n, tilt_deg=8.0)
        world = SyntheticWorld(rng, cam=cfg.camera, length=60.0)
        sys = System(cfg)
        states = []
        for i in range(n):
            feats = world.render(gt[i])
            # strip depth: pure mono frames
            feats = feats._replace(
                depth=jnp.full_like(feats.depth, -1.0),
                u_right=jnp.full_like(feats.u_right, -1.0),
            )
            r = sys.track_features(feats, i * FRAME_DT,
                                   imu=None if i == 0 else imu_blocks[i - 1])
            states.append(r.state)
        assert sys.map.imu_initialized, "IMU never initialized (mono)"
        # mono init waits for ≥ 1° median parallax (reference ReconstructF
        # minParallax gate) — with this slow forward motion that takes
        # several frames; require init within 20 and no loss afterwards
        first_ok = next(i for i, s in enumerate(states) if s == trk.OK)
        assert first_ok <= 20, [trk.STATE_NAMES[s] for s in states]
        ok_states = states[first_ok:]
        assert all(s == trk.OK for s in ok_states), [trk.STATE_NAMES[s] for s in states]
        # rigid alignment only — scale must come out of the IMU
        err = aligned_ate(sys, gt, with_scale=False)
        assert err < 1.0, err
        err_s = aligned_ate(sys, gt, with_scale=True)
        # and the recovered scale is genuine: scale-free alignment should
        # not be dramatically better than the metric one
        assert err < 3 * max(err_s, 0.05), (err, err_s)


class TestLocalInertialBA:
    def test_inertial_ba_runs_in_mapping_and_viba_fires(self, rng):
        """After IMU init, the mapping plane must run LocalInertialBA
        (reference LocalMapping.cc:149) and the VIBA1 refinement must fire
        ~5 s after init (LocalMapping.cc:218-248). Observable: keyframe
        biases become non-zero/consistent and the VIBA stage advances."""
        cfg = dataclasses.replace(
            kitti_rgbl_config(sensor=IMU_RGBD), imu=ImuConfig(), loop_closing=False,
        )
        n = 80
        gt, imu_blocks, vel_gt, _ = simulate_vi_sequence(rng, n)
        world = SyntheticWorld(rng, cam=cfg.camera, length=90.0)
        sys = System(cfg)
        for i in range(n):
            feats = world.render(gt[i])
            sys.track_features(feats, i * FRAME_DT,
                               imu=None if i == 0 else imu_blocks[i - 1])
        assert sys.map.imu_initialized
        # VIBA1 fired (>=5 s of post-init data at 10 Hz over 80 frames)
        assert getattr(sys.mapper, "_viba_stage", 0) >= 1
        # keyframe velocities stay metric and near GT after inertial BA
        kfs = sys.map.valid_kf_ids()
        v_err = np.linalg.norm(sys.map.kf_vel[kfs[-1]]) - np.linalg.norm(vel_gt[-1])
        assert abs(v_err) / np.linalg.norm(vel_gt[-1]) < 0.4
        err = aligned_ate(sys, gt, with_scale=True)
        assert err < 0.5, err


class TestInertialLostGrace:
    def test_blackout_dead_reckoning(self, rng):
        """1 s of blacked-out imagery after IMU init: the tracker must
        ride the IMU prediction through RECENTLY_LOST (never LOST —
        reference time_recently_lost grace, Tracking.cc:2019-2035) and
        re-acquire visually when texture returns, without relocalization."""
        cfg = dataclasses.replace(
            kitti_rgbl_config(sensor=IMU_RGBD), imu=ImuConfig(), loop_closing=False,
        )
        n = 50
        blackout = set(range(30, 40))  # 1 s at 10 Hz
        gt, imu_blocks, vel_gt, _ = simulate_vi_sequence(rng, n)
        world = SyntheticWorld(rng, cam=cfg.camera, length=60.0)
        sys = System(cfg)
        states, poses = [], []
        reloc_calls = {"grace": 0}
        wrapped = False
        for i in range(n):
            feats = world.render(gt[i])
            if i in blackout:
                feats = feats._replace(valid=jnp.zeros_like(feats.valid))
            if sys.tracker is not None and not wrapped:
                tr = sys.tracker
                orig = tr._relocalization

                def counting(f, _orig=orig, _tr=tr):
                    if _tr.state in (trk.RECENTLY_LOST, trk.LOST):
                        reloc_calls["grace"] += 1
                    return _orig(f)

                tr._relocalization = counting
                wrapped = True
            r = sys.track_features(feats, i * FRAME_DT,
                                   imu=None if i == 0 else imu_blocks[i - 1])
            states.append(r.state)
            poses.append(r.pose)
        assert sys.map.imu_initialized, "IMU never initialized"
        assert states[29] == trk.OK
        # grace: the blackout never degrades past RECENTLY_LOST
        assert all(states[i] in (trk.OK, trk.RECENTLY_LOST) for i in blackout), \
            [trk.STATE_NAMES[states[i]] for i in sorted(blackout)]
        # visual re-acquisition without relocalization
        assert all(s == trk.OK for s in states[42:]), \
            [trk.STATE_NAMES[s] for s in states[40:]]
        assert reloc_calls["grace"] == 0, "grace should bypass relocalization"
        # the IMU carried the pose: distance traveled across the blackout
        # matches ground truth (both metric after init)
        def center(Tcw):
            return np.asarray(lie.se3_trans(lie.se3_inv(jnp.asarray(Tcw))))
        d_est = np.linalg.norm(center(poses[40]) - center(poses[29]))
        d_gt = np.linalg.norm(center(gt[40]) - center(gt[29]))
        assert abs(d_est - d_gt) < 0.5, (d_est, d_gt)
