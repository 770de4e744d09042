"""Sliding-window visual-inertial BA (``optim.inertial_ba``) — the
LocalInertialBA / FullInertialBA replacement (reference Optimizer.cc:2383,
:392). Validates the analytic visual Jacobian against autodiff, and bias/
state recovery on a simulated VI window."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie, camera
from orb_slam3_rgbl_tpu.imu import preintegration as pre
from orb_slam3_rgbl_tpu.optim import inertial_ba as viba

from test_inertial import simulate_vi, preintegrate_all

CAM = kitti_rgbl_config().camera


def build_problem(rng, n_kf=8, bg=np.zeros(3), ba=np.zeros(3),
                  pose_noise=0.0, vel_noise=0.0, n_lm=256, obs_noise=0.3):
    states, metas, dt = simulate_vi(rng, n_kf=n_kf, bg=bg, ba=ba)
    meas = preintegrate_all(metas, dt, pre.ImuBias.zero())

    Twb_true = np.stack([
        np.asarray(lie.se3(lie.matrix_to_quat(jnp.asarray(R.astype(np.float32))),
                           jnp.asarray(p.astype(np.float32))))
        for R, _, p in states
    ])
    vel_true = np.stack([v for _, v, _ in states]).astype(np.float32)

    # landmarks in front of the trajectory
    Xw = rng.uniform([-20, -20, -20], [20, 20, 20], (n_lm, 3)).astype(np.float32)
    Xw[:, 2] += 25.0

    D = n_kf
    T_cb = np.asarray(lie.se3_identity())
    obs_kf = np.tile(np.arange(n_kf, dtype=np.int32), (n_lm, 1))
    obs_uv = np.zeros((n_lm, D, 2), np.float32)
    obs_ur = np.full((n_lm, D), -1.0, np.float32)
    obs_mask = np.zeros((n_lm, D), bool)
    for k in range(n_kf):
        Tcw = lie.se3_inv(jnp.asarray(Twb_true[k]))
        pc = np.asarray(lie.se3_apply(Tcw, jnp.asarray(Xw)))
        uv = np.asarray(camera.project(CAM, jnp.asarray(pc)))
        ok = pc[:, 2] > 1.0
        obs_uv[:, k] = uv + rng.normal(0, obs_noise, (n_lm, 2))
        obs_ur[:, k] = np.where(ok, obs_uv[:, k, 0] - CAM.bf / np.maximum(pc[:, 2], 1e-3), -1.0)
        obs_mask[:, k] = ok

    # perturb the initial guess
    Twb0 = Twb_true.copy()
    vel0 = vel_true.copy()
    for k in range(1, n_kf):
        tau = np.concatenate([rng.normal(0, pose_noise, 3),
                              rng.normal(0, pose_noise * 0.3, 3)]).astype(np.float32)
        Twb0[k] = np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(tau)),
                                         jnp.asarray(Twb0[k])))
        vel0[k] += rng.normal(0, vel_noise, 3).astype(np.float32)

    P = viba.VIBAProblem(
        Twb=jnp.asarray(Twb0), vel=jnp.asarray(vel0),
        bg=jnp.zeros((n_kf, 3), jnp.float32), ba=jnp.zeros((n_kf, 3), jnp.float32),
        state_fixed=jnp.asarray(np.arange(n_kf) == 0),
        state_valid=jnp.ones(n_kf, bool),
        T_cb=jnp.asarray(T_cb),
        landmarks=jnp.asarray(Xw), lm_valid=jnp.ones(n_lm, bool),
        obs_kf=jnp.asarray(obs_kf), obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((n_lm, D), jnp.float32),
        obs_mask=jnp.asarray(obs_mask),
        pair_i=jnp.arange(n_kf - 1, dtype=jnp.int32),
        pair_j=jnp.arange(1, n_kf, dtype=jnp.int32),
        pair_meas=meas,
        pair_valid=jnp.ones(n_kf - 1, bool),
        info_bg=jnp.full(n_kf - 1, 1e6, jnp.float32),
        info_ba=jnp.full(n_kf - 1, 1e4, jnp.float32),
    )
    return P, Twb_true, vel_true


class TestVisualJacobian:
    def test_matches_autodiff(self, rng):
        P, *_ = build_problem(rng, n_kf=4, n_lm=8)

        def res_fn(d6, m, d):
            Twb = P.Twb.at[P.obs_kf[m, d]].set(
                lie.se3_mul(lie.se3_exp(d6), P.Twb[P.obs_kf[m, d]]))
            Tcw = lie.se3_mul(P.T_cb, lie.se3_inv(Twb[P.obs_kf[m, d]]))
            pc = lie.se3_apply(Tcw, P.landmarks[m])
            u = CAM.fx * pc[0] / pc[2] + CAM.cx
            v = CAM.fy * pc[1] / pc[2] + CAM.cy
            ur = u - CAM.bf / pc[2]
            return jnp.stack([P.obs_uv[m, d, 0] - u, P.obs_uv[m, d, 1] - v,
                              jnp.where(P.obs_ur[m, d] >= 0, P.obs_ur[m, d] - ur, 0.0)])

        _, Jpose, Jl, *_ = viba._visual_linearize(
            P, CAM, jnp.asarray(False), jnp.asarray(P.obs_mask))
        for (m, d) in [(0, 1), (3, 2), (7, 0)]:
            J_ad = jax.jacfwd(res_fn)(jnp.zeros(6, jnp.float32), m, d)
            np.testing.assert_allclose(np.asarray(Jpose[m, d]), np.asarray(J_ad),
                                       rtol=2e-3, atol=2e-3)


class TestViBundleAdjust:
    def test_bias_and_state_recovery(self, rng):
        bg_true = np.array([0.02, -0.01, 0.015], np.float32)
        ba_true = np.array([0.05, -0.10, 0.08], np.float32)
        P, Twb_true, vel_true = build_problem(
            rng, n_kf=8, bg=bg_true, ba=ba_true,
            pose_noise=0.05, vel_noise=0.2)
        res = viba.vi_bundle_adjust(P, CAM, iterations=12, huber_iters=6)

        bg_est = np.asarray(res.bg)[1:].mean(0)
        ba_est = np.asarray(res.ba)[1:].mean(0)
        assert np.linalg.norm(bg_est - bg_true) < 5e-3, (bg_est, bg_true)
        assert np.linalg.norm(ba_est - ba_true) < 5e-2, (ba_est, ba_true)

        # poses improved vs the perturbed initialization
        def pose_err(Twb):
            return np.linalg.norm(np.asarray(Twb)[:, 4:7] - Twb_true[:, 4:7], axis=1).mean()

        assert pose_err(res.Twb) < 0.5 * pose_err(P.Twb)
        # velocities recovered
        v_err = np.linalg.norm(np.asarray(res.vel) - vel_true, axis=1).mean()
        assert v_err < 0.15, v_err

    def test_visual_only_leaves_bias_wrong(self, rng):
        """Contrast: the visual-only local BA cannot observe biases —
        vi_bundle_adjust with zeroed IMU weights keeps bias at 0 (sanity
        that the inertial factors do the work in the test above)."""
        bg_true = np.array([0.02, -0.01, 0.015], np.float32)
        P, *_ = build_problem(rng, n_kf=6, bg=bg_true, pose_noise=0.02)
        P0 = P._replace(pair_valid=jnp.zeros_like(P.pair_valid))
        res = viba.vi_bundle_adjust(P0, CAM, iterations=6)
        assert np.linalg.norm(np.asarray(res.bg)) < 1e-6
