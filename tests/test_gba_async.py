"""Interruptible global BA (round 4):

* abort path — a running solve bails between LM chunks when the abort
  event fires (reference ``mbStopGBA``, LoopClosing.cc:1206/2268);
* propagation path — keyframes/landmarks created WHILE the solve ran are
  corrected through their anchor keyframe at writeback (reference
  spanning-tree propagation, LoopClosing.cc:2337-2440);
* cull redirects — trajectory frames and landmarks anchored to a culled
  keyframe keep moving with later corrections of the surviving parent
  (reference ``SaveTrajectoryKITTI`` parent walk, System.cc:1348-1405).
"""

import threading

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.slam import tracking as trk

from test_loop_closing import run_loop_sequence


class TestGbaAbort:
    def test_preset_abort_returns_none_and_leaves_map(self, rng):
        sys, gt, results = run_loop_sequence(rng, n_frames=90)
        lc = sys.loop_closer
        assert len(lc.events) >= 1
        poses_before = sys.map.kf_pose.copy()
        ev = threading.Event()
        ev.set()
        out = lc._global_ba_solve(iterations=6, abort_event=ev)
        assert out is None
        np.testing.assert_array_equal(sys.map.kf_pose, poses_before)

    def test_mid_solve_abort(self, rng):
        """Abort set after the first chunk: the solve must stop early."""
        sys, gt, results = run_loop_sequence(rng, n_frames=90)
        lc = sys.loop_closer
        ev = threading.Event()
        calls = {"n": 0}

        class TripwireEvent:
            def is_set(self):
                calls["n"] += 1
                return calls["n"] > 1  # pass the first check, then abort

        out = lc._global_ba_solve(iterations=6, abort_event=TripwireEvent())
        assert out is None
        assert calls["n"] == 2  # exactly one chunk ran


class TestGbaPropagation:
    def test_keyframes_inserted_during_solve_are_propagated(self, rng):
        """Solve on a snapshot, mutate the map as tracking would while the
        solve runs (new keyframe + new landmarks), then apply: the fresh
        keyframe must move rigidly with its anchor and the fresh landmark
        must move with its reference keyframe."""
        sys, gt, results = run_loop_sequence(rng, n_frames=90)
        lc = sys.loop_closer
        m = sys.map

        out = lc._global_ba_solve(iterations=4)
        assert out is not None
        window = out[0]

        # simulate a keyframe + landmark created mid-solve
        anchor = int(window[-1])
        T_rel = np.asarray(
            lie.se3_exp(jnp.asarray([0.1, 0.02, -0.05, 0.01, 0.03, 0.0])),
            np.float32)
        new_pose = lie.np_se3_mul(T_rel, m.kf_pose[anchor])
        n_feat = m.n_features
        kf_new = m.add_keyframe(
            new_pose, m.kf_uv[anchor], m.kf_octave[anchor], m.kf_desc[anchor],
            m.kf_depth[anchor], m.kf_ur[anchor], m.kf_feat_valid[anchor],
            m.kf_lm_idx[anchor].copy(), 99.9, 999,
            angle=m.kf_angle[anchor])
        X_new = np.array([[1.0, 2.0, 25.0]], np.float32)
        lm_new = m.add_landmarks(
            X_new, m.kf_desc[kf_new][:1], kf_new, np.array([0]),
            np.array([[0, 0, 1.0]], np.float32),
            np.array([30.0], np.float32), np.array([3.0], np.float32))[0]
        # expected invariants after apply:
        T_rel_before = lie.np_se3_mul(m.kf_pose[kf_new],
                                      lie.np_se3_inv(m.kf_pose[anchor]))
        X_cam_before = np.asarray(
            lie.se3_apply(jnp.asarray(m.kf_pose[kf_new]), jnp.asarray(X_new[0])))

        lc._apply_gba(out)

        # fresh KF moved rigidly with its anchor (same relative transform)
        T_rel_after = lie.np_se3_mul(m.kf_pose[kf_new],
                                     lie.np_se3_inv(m.kf_pose[anchor]))
        np.testing.assert_allclose(T_rel_after, T_rel_before, atol=1e-4)
        # fresh landmark kept its camera-frame position w.r.t. its ref KF
        X_cam_after = np.asarray(
            lie.se3_apply(jnp.asarray(m.kf_pose[kf_new]),
                          jnp.asarray(m.lm_pos[lm_new])))
        np.testing.assert_allclose(X_cam_after, X_cam_before, atol=1e-3)

    def test_async_system_runs_gba_job(self, rng):
        """End-to-end: async mapping ON — the loop correction schedules
        the GBA job, the result lands by shutdown, trajectory stays sane."""
        from orb_slam3_rgbl_tpu.geometry import align

        import dataclasses
        from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
        from orb_slam3_rgbl_tpu.slam.system import System
        from test_loop_closing import CircularWorld, circle_trajectory

        cfg = dataclasses.replace(kitti_rgbl_config(), loop_closing=True)
        world = CircularWorld(rng, cfg.camera, 18.0)
        gt = circle_trajectory(90, 18.0)
        sys = System(cfg)
        sys.async_mapping = True
        results = [
            sys.track_features(world.render(gt[i], n_feat=600, px_noise=0.6),
                               i * 0.1)
            for i in range(len(gt))
        ]
        sys.shutdown()
        assert len(sys.loop_closer.events) >= 1
        est = sys.trajectory()
        gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        err = float(align.ate_rmse(jnp.asarray(gt_twc[: len(est), 4:7]),
                                   jnp.asarray(est[:, 4:7])))
        assert err < 1.0, err


class TestCullRedirect:
    def test_effective_pose_moves_with_parent_correction(self, rng):
        sys, gt, results = run_loop_sequence(rng, n_frames=60,
                                             loop_closing=False)
        m = sys.map
        live = m.valid_kf_ids()
        assert live.size >= 4
        victim = int(live[2])
        lm_of_victim = np.nonzero(m.lm_ref_kf[: m.n_lm] == victim)[0]
        m.remove_keyframe(victim)
        assert victim in m.kf_redirect
        parent, T_kp = m.kf_redirect[victim]
        assert m.kf_valid[parent]
        # landmarks re-anchored to the parent
        if lm_of_victim.size:
            assert (m.lm_ref_kf[lm_of_victim] == parent).all()
        # apply a synthetic correction to the parent pose
        dT = np.asarray(
            lie.se3_exp(jnp.asarray([0.5, -0.2, 0.1, 0.02, -0.01, 0.03])),
            np.float32)
        m.kf_pose[parent] = lie.np_se3_mul(dT, m.kf_pose[parent])
        eff = m.effective_kf_pose(victim)
        expect = lie.np_se3_mul(T_kp, m.kf_pose[parent])
        np.testing.assert_allclose(eff, expect, atol=1e-5)

    def test_trajectory_frames_follow_culled_ref(self, rng):
        """Frames logged against a later-culled keyframe must resolve
        through the redirect — i.e. receive the parent's corrections."""
        sys, gt, results = run_loop_sequence(rng, n_frames=60,
                                             loop_closing=False)
        m = sys.map
        tr = sys.tracker
        refs = np.asarray(tr.traj_ref_kf)
        # pick a reference KF used by some frames that is NOT the last
        cands = [k for k in np.unique(refs) if m.kf_valid[k]
                 and k != tr.ref_kf and (refs == k).sum() >= 2]
        assert cands, refs
        victim = int(cands[len(cands) // 2])
        before = sys.trajectory()
        m.remove_keyframe(victim)
        after = sys.trajectory()
        # cull alone must not move the resolved frames (redirect composes
        # to the same pose as long as the parent is uncorrected)
        sel = refs == victim
        np.testing.assert_allclose(after[: len(before)][sel][:, 4:7],
                                   before[sel][:, 4:7], atol=1e-4)
        # now correct the parent: the victim's frames must move too
        parent, _ = m.kf_redirect[victim]
        dT = np.asarray(lie.se3_exp(jnp.asarray([1.0, 0, 0, 0, 0, 0])), np.float32)
        m.kf_pose[parent] = lie.np_se3_mul(dT, m.kf_pose[parent])
        moved = sys.trajectory()
        delta = np.linalg.norm(
            moved[: len(before)][sel][:, 4:7] - before[sel][:, 4:7], axis=1)
        assert (delta > 0.5).all(), delta
