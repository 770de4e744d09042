"""Visual-inertial optimization.

Replaces the inertial entry points of the reference ``Optimizer``:

* ``PoseInertialOptimizationLastKeyFrame`` (``Optimizer.cc:3498+``) →
  :func:`inertial_pose_optimize` — motion-only VI solve of the current
  frame's 15-DoF state [pose, velocity, gyro bias, accel bias] against
  reprojection factors + the preintegration factor to the last keyframe
  + bias random-walk priors.
* ``InertialOptimization`` (``Optimizer.cc:3042/3227/3389``) →
  :func:`imu_initialization` — gravity direction, scale, biases, and
  per-keyframe velocities from visual keyframe poses + preintegrated
  windows (the 3-stage priorG/priorA schedule of
  ``LocalMapping::InitializeIMU`` maps to the ``prior_g``/``prior_a``
  arguments).

All Jacobians come from forward-mode autodiff over the residual stacks —
the states are tiny, the factor batches are dense, and XLA fuses the
jacfwd products into the same kernels as the residuals.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera
from orb_slam3_rgbl_tpu.geometry import camera as cam_mod
from orb_slam3_rgbl_tpu.imu import preintegration as pre
from orb_slam3_rgbl_tpu.optim.pose_opt import PoseObs, CHI2_MONO, CHI2_STEREO


class VIState(NamedTuple):
    """World-frame body state (the reference's VertexPose+VertexVelocity+
    VertexGyroBias+VertexAccBias block)."""

    Twb: jax.Array   # (7,) body→world SE3 (world-frame pose)
    vw: jax.Array    # (3,) world velocity
    bias: pre.ImuBias


def _weighted_gn_step(residual_fn, x0, dim, lam, dtype):
    """One damped GN step on a flat parameter vector via jacfwd."""
    r, w = residual_fn(x0)
    J = jax.jacfwd(lambda x: residual_fn(x)[0])(x0)
    H = J.T @ (w[:, None] * J) + lam * jnp.eye(dim, dtype=dtype)
    b = J.T @ (w * r)
    return -jnp.linalg.solve(H, b), jnp.sum(w * r * r)


@functools.partial(jax.jit, static_argnames=("cam", "iterations"))
def inertial_pose_optimize(
    state0: VIState,
    prev: VIState,
    meas: pre.Preintegrated,
    obs: PoseObs,
    T_cb: jax.Array,
    cam: PinholeCamera,
    info_bias_g: float = 1e5,
    info_bias_a: float = 1e4,
    iterations: int = 8,
):
    """Optimize the current frame's 15-DoF state.

    Args:
      state0: initial current state (world frame, body pose).
      prev: previous keyframe state (fixed).
      meas: preintegration prev→current.
      obs: visual observations (landmarks + pixels); camera pose is
        ``T_cb · Twb⁻¹``.
      T_cb: (7,) body→camera extrinsic (inverse of the reference's Tbc).

    Returns (VIState, n_visual_inliers).
    """
    dtype = state0.Twb.dtype
    obs = PoseObs(
        Xw=obs.Xw.astype(dtype), uv=obs.uv.astype(dtype),
        u_right=obs.u_right.astype(dtype),
        inv_sigma2=obs.inv_sigma2.astype(dtype), valid=obs.valid,
    )
    # information from the preintegration covariance (diagonal approx —
    # the reference uses the full 9×9 inverse; diagonal keeps the weights
    # strictly positive under float32 for long windows). Capped relative
    # to the visual weights so the joint f32 system stays conditioned.
    inert_info = 1.0 / jnp.maximum(jnp.diagonal(meas.cov), 1e-10)
    inert_info = jnp.minimum(inert_info, 1e6)

    def unpack(x):
        dpose = x[0:6]
        dv = x[6:9]
        dbg = x[9:12]
        dba = x[12:15]
        Twb = lie.se3_mul(lie.se3_exp(dpose), state0.Twb)
        vw = state0.vw + dv
        bias = pre.ImuBias(state0.bias.bg + dbg, state0.bias.ba + dba)
        return VIState(Twb, vw, bias)

    def residuals(x, visual_active):
        s = unpack(x)
        # visual: project landmarks through T_cw = T_cb · Twb⁻¹
        Tcw = lie.se3_mul(T_cb, lie.se3_inv(s.Twb))
        pc = lie.se3_apply(Tcw, obs.Xw)
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        uvh = cam_mod.geo_project(cam, pc)
        u, v = uvh[:, 0], uvh[:, 1]
        if cam_mod.is_fisheye(cam):
            is_stereo = jnp.zeros_like(obs.u_right >= 0)
            ur = jnp.zeros_like(u)
        else:
            is_stereo = obs.u_right >= 0
            ur = u - cam.bf / z
        r_vis = jnp.stack(
            [obs.uv[:, 0] - u, obs.uv[:, 1] - v, jnp.where(is_stereo, obs.u_right - ur, 0.0)],
            axis=-1,
        ).reshape(-1)
        w_vis = jnp.repeat(jnp.where(visual_active & (pc[:, 2] > 1e-3), obs.inv_sigma2, 0.0), 3)

        # inertial residual prev → current
        r_in = pre.inertial_residual(
            meas,
            lie.se3_rot(prev.Twb), prev.vw, lie.se3_trans(prev.Twb),
            lie.se3_rot(s.Twb), s.vw, lie.se3_trans(s.Twb),
            s.bias,
        )
        # bias random-walk prior to the previous bias
        r_bg = s.bias.bg - prev.bias.bg
        r_ba = s.bias.ba - prev.bias.ba
        r = jnp.concatenate([r_vis, r_in, r_bg, r_ba])
        w = jnp.concatenate([
            w_vis, inert_info,
            jnp.full(3, info_bias_g, dtype), jnp.full(3, info_bias_a, dtype),
        ])
        return r, w

    def chi2_visual(x):
        s = unpack(x)
        Tcw = lie.se3_mul(T_cb, lie.se3_inv(s.Twb))
        pc = lie.se3_apply(Tcw, obs.Xw)
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        uvh = cam_mod.geo_project(cam, pc)
        u, v = uvh[:, 0], uvh[:, 1]
        if cam_mod.is_fisheye(cam):
            is_stereo = jnp.zeros_like(obs.u_right >= 0)
            ur = jnp.zeros_like(u)
        else:
            is_stereo = obs.u_right >= 0
            ur = u - cam.bf / z
        e2 = (obs.uv[:, 0] - u) ** 2 + (obs.uv[:, 1] - v) ** 2 + jnp.where(
            is_stereo, (obs.u_right - ur) ** 2, 0.0
        )
        return e2 * obs.inv_sigma2, is_stereo, pc[:, 2] > 1e-3

    def round_(carry, _):
        x, active, lam = carry

        def it_step(carry2, _):
            x, lam = carry2
            dx, cost = _weighted_gn_step(lambda xx: residuals(xx, active), x, 15, lam, dtype)
            x_new = x + dx
            r2, w2 = residuals(x_new, active)
            c_new = jnp.sum(w2 * r2 * r2)
            ok = (c_new < cost) & jnp.isfinite(c_new)
            x = jnp.where(ok, x_new, x)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return (x, lam), None

        (x, lam), _ = jax.lax.scan(it_step, (x, lam), None, length=iterations)
        chi2, is_stereo, depth_ok = chi2_visual(x)
        th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        active = obs.valid & depth_ok & (chi2 <= th)
        return (x, active, lam), None

    x0 = jnp.zeros(15, dtype)
    active0 = obs.valid
    (x, active, _), _ = jax.lax.scan(round_, (x0, active0, jnp.asarray(1e-2, dtype)), None, length=2)
    s = unpack(x)
    # Hessian of the current state at the solution — the seed of the
    # marginalization-prior chain (the reference recovers the same block
    # to build ``ConstraintPoseImu`` after the solve, Optimizer.cc:3595+)
    r_f, w_f = residuals(x, active)
    J_f = jax.jacfwd(lambda xx: residuals(xx, active)[0])(x)
    H_cur = J_f.T @ (w_f[:, None] * J_f)
    return s, jnp.sum(active.astype(jnp.int32)), H_cur


@functools.partial(jax.jit, static_argnames=("cam", "iterations"))
def inertial_pose_optimize_prior(
    state0: VIState,
    prev0: VIState,
    prior_sqrt_info: jax.Array,
    meas: pre.Preintegrated,
    obs: PoseObs,
    T_cb: jax.Array,
    cam: PinholeCamera,
    info_bias_g: float = 1e5,
    info_bias_a: float = 1e4,
    iterations: int = 8,
):
    """``PoseInertialOptimizationLastFrame`` with the carried
    marginalization prior (reference ``Optimizer.cc:3389+``, prior edge
    ``EdgePriorPoseImu`` built from ``mpcpi``): a JOINT 30-DoF solve of
    [previous frame, current frame], where the previous state is
    constrained by the last solve's marginal information instead of held
    fixed (the infinite-prior limit the round-4 code used — it
    over-constrains and biases the bias estimates).

    ``prior_sqrt_info``: (15, 15) lower-triangular L with H_prior = L Lᵀ
    about the mean ``prev0``; the prior residual Lᵀ·δ_prev keeps the GN
    weights diagonal.

    Returns (cur VIState, prev VIState, n_visual_inliers,
    H_marg (15, 15)) — H_marg is the current state's marginal Hessian
    (prev Schur-eliminated), the next frame's prior (``Marginalize``,
    Optimizer.cc:2960)."""
    dtype = state0.Twb.dtype
    obs = PoseObs(
        Xw=obs.Xw.astype(dtype), uv=obs.uv.astype(dtype),
        u_right=obs.u_right.astype(dtype),
        inv_sigma2=obs.inv_sigma2.astype(dtype), valid=obs.valid,
    )
    inert_info = 1.0 / jnp.maximum(jnp.diagonal(meas.cov), 1e-10)
    inert_info = jnp.minimum(inert_info, 1e6)
    L = prior_sqrt_info.astype(dtype)

    def unpack_one(base: VIState, d):
        Twb = lie.se3_mul(lie.se3_exp(d[0:6]), base.Twb)
        vw = base.vw + d[6:9]
        bias = pre.ImuBias(base.bias.bg + d[9:12], base.bias.ba + d[12:15])
        return VIState(Twb, vw, bias)

    def unpack(x):
        return unpack_one(prev0, x[:15]), unpack_one(state0, x[15:])

    def residuals(x, visual_active):
        p, s = unpack(x)
        Tcw = lie.se3_mul(T_cb, lie.se3_inv(s.Twb))
        pc = lie.se3_apply(Tcw, obs.Xw)
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        uvh = cam_mod.geo_project(cam, pc)
        u, v = uvh[:, 0], uvh[:, 1]
        if cam_mod.is_fisheye(cam):
            is_stereo = jnp.zeros_like(obs.u_right >= 0)
            ur = jnp.zeros_like(u)
        else:
            is_stereo = obs.u_right >= 0
            ur = u - cam.bf / z
        r_vis = jnp.stack(
            [obs.uv[:, 0] - u, obs.uv[:, 1] - v,
             jnp.where(is_stereo, obs.u_right - ur, 0.0)], axis=-1
        ).reshape(-1)
        w_vis = jnp.repeat(
            jnp.where(visual_active & (pc[:, 2] > 1e-3), obs.inv_sigma2, 0.0), 3)
        r_in = pre.inertial_residual(
            meas,
            lie.se3_rot(p.Twb), p.vw, lie.se3_trans(p.Twb),
            lie.se3_rot(s.Twb), s.vw, lie.se3_trans(s.Twb),
            s.bias,
        )
        r_bg = s.bias.bg - p.bias.bg
        r_ba = s.bias.ba - p.bias.ba
        r_prior = L.T @ x[:15]          # δᵀ L Lᵀ δ = δᵀ H_prior δ
        r = jnp.concatenate([r_vis, r_in, r_bg, r_ba, r_prior])
        w = jnp.concatenate([
            w_vis, inert_info,
            jnp.full(3, info_bias_g, dtype), jnp.full(3, info_bias_a, dtype),
            jnp.ones(15, dtype),
        ])
        return r, w

    def chi2_visual(x):
        _, s = unpack(x)
        Tcw = lie.se3_mul(T_cb, lie.se3_inv(s.Twb))
        pc = lie.se3_apply(Tcw, obs.Xw)
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        uvh = cam_mod.geo_project(cam, pc)
        u, v = uvh[:, 0], uvh[:, 1]
        if cam_mod.is_fisheye(cam):
            is_stereo = jnp.zeros_like(obs.u_right >= 0)
            ur = jnp.zeros_like(u)
        else:
            is_stereo = obs.u_right >= 0
            ur = u - cam.bf / z
        e2 = (obs.uv[:, 0] - u) ** 2 + (obs.uv[:, 1] - v) ** 2 + jnp.where(
            is_stereo, (obs.u_right - ur) ** 2, 0.0
        )
        return e2 * obs.inv_sigma2, is_stereo, pc[:, 2] > 1e-3

    def round_(carry, _):
        x, active, lam = carry

        def it_step(carry2, _):
            x, lam = carry2
            dx, cost = _weighted_gn_step(
                lambda xx: residuals(xx, active), x, 30, lam, dtype)
            x_new = x + dx
            r2, w2 = residuals(x_new, active)
            c_new = jnp.sum(w2 * r2 * r2)
            ok = (c_new < cost) & jnp.isfinite(c_new)
            x = jnp.where(ok, x_new, x)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return (x, lam), None

        (x, lam), _ = jax.lax.scan(it_step, (x, lam), None, length=iterations)
        chi2, is_stereo, depth_ok = chi2_visual(x)
        th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        active = obs.valid & depth_ok & (chi2 <= th)
        return (x, active, lam), None

    x0 = jnp.zeros(30, dtype)
    (x, active, _), _ = jax.lax.scan(
        round_, (x0, obs.valid, jnp.asarray(1e-2, dtype)), None, length=2)
    p, s = unpack(x)

    # marginalize the previous state out of the joint Hessian → the
    # current frame's prior for the next solve (Optimizer::Marginalize)
    r_f, w_f = residuals(x, active)
    J_f = jax.jacfwd(lambda xx: residuals(xx, active)[0])(x)
    H = J_f.T @ (w_f[:, None] * J_f)
    H_pp = H[:15, :15] + 1e-6 * jnp.eye(15, dtype=dtype)
    H_pc = H[:15, 15:]
    H_cc = H[15:, 15:]
    H_marg = H_cc - H_pc.T @ jnp.linalg.solve(H_pp, H_pc)
    return s, p, jnp.sum(active.astype(jnp.int32)), H_marg


@functools.partial(jax.jit, static_argnames=("iterations", "fix_scale"))
def imu_initialization(
    Twb: jax.Array,          # (K, 7) visual keyframe body poses (world frame)
    meas: pre.Preintegrated,  # stacked (K-1, ...) preintegrations i→i+1
    valid_pair: jax.Array,   # (K-1,) bool
    prior_g: float = 1e2,
    prior_a: float = 1e6,
    iterations: int = 40,
    fix_scale: bool = False,
):
    """Estimate gravity direction, metric scale, shared biases, and
    per-keyframe velocities from up-to-scale visual poses + preintegrated
    IMU (``InertialOptimization``; the priorG/priorA schedule of
    ``LocalMapping::InitializeIMU`` passes different priors per stage).

    Returns dict(Rwg quaternion, scale, bias, velocities (K, 3), cost).
    """
    K = Twb.shape[0]
    dtype = Twb.dtype
    g0 = jnp.asarray([0.0, 0.0, -pre.GRAVITY], dtype)

    def unpack(x):
        th_g = jnp.concatenate([x[0:2], jnp.zeros(1, dtype)])  # 2-dof gravity rotation
        s = jnp.where(fix_scale, 1.0, jnp.exp(x[2]))
        bg = x[3:6]
        ba = x[6:9]
        vel = x[9:].reshape(K, 3)
        Rwg = lie.so3_exp(th_g)
        return Rwg, s, pre.ImuBias(bg, ba), vel

    q_all = lie.se3_rot(Twb)
    p_all = lie.se3_trans(Twb)

    def residuals(x):
        Rwg, s, bias, vel = unpack(x)
        g = lie.quat_rotate(Rwg, g0)

        def pair_res(i):
            m = jax.tree_util.tree_map(lambda a: a[i], meas)
            dt = m.dt
            q1, q2 = q_all[i], q_all[i + 1]
            p1, p2 = p_all[i], p_all[i + 1]
            v1, v2 = vel[i], vel[i + 1]
            R1t = lie.quat_conj(q1)
            R1m = lie.quat_to_matrix(R1t)
            er = lie.so3_log(
                lie.quat_mul(lie.quat_conj(pre.delta_rotation(m, bias)), lie.quat_mul(R1t, q2))
            )
            ev = R1m @ (v2 - v1 - g * dt) - pre.delta_velocity(m, bias)
            ep = R1m @ (s * (p2 - p1) - v1 * dt - 0.5 * g * dt * dt) - pre.delta_position(m, bias)
            info = 1.0 / jnp.maximum(jnp.diagonal(m.cov), 1e-10)
            return jnp.concatenate([er, ev, ep]), info

        rs, infos = jax.vmap(pair_res)(jnp.arange(K - 1))
        w = jnp.where(valid_pair[:, None], infos, 0.0)
        r = jnp.concatenate([rs.reshape(-1), x[3:6], x[6:9]])
        wts = jnp.concatenate([
            w.reshape(-1), jnp.full(3, prior_g, dtype), jnp.full(3, prior_a, dtype)
        ])
        # normalize: preintegration information spans ~1e10 (1/cov of a
        # short window) which wrecks f32 normal equations; weighted LS is
        # invariant to uniform weight scaling
        wts = wts / jnp.maximum(jnp.max(wts), 1e-12)
        return r, wts

    # ---- stage A: gyro bias from rotation residuals alone (small GN) ----
    def rot_residuals(bg):
        def rr(i):
            m = jax.tree_util.tree_map(lambda a: a[i], meas)
            return lie.so3_log(
                lie.quat_mul(
                    lie.quat_conj(pre.delta_rotation(m, pre.ImuBias(bg, jnp.zeros(3, dtype)))),
                    lie.quat_mul(lie.quat_conj(q_all[i]), q_all[i + 1]),
                )
            )
        r = jax.vmap(rr)(jnp.arange(K - 1))
        return jnp.where(valid_pair[:, None], r, 0.0).reshape(-1), jnp.ones((K - 1) * 3, dtype)

    bg0 = jnp.zeros(3, dtype)
    for _ in range(3):
        dbg, _ = _weighted_gn_step(rot_residuals, bg0, 3, jnp.asarray(1e-8, dtype), dtype)
        bg0 = bg0 + dbg

    # ---- stage B: linear solve for velocities, gravity (free 3-dof),
    # scale — the equations are linear given rotations and bg ----
    bias_lin = pre.ImuBias(bg0, jnp.zeros(3, dtype))
    n_rows = (K - 1) * 6
    n_cols = 3 * K + 4  # velocities, g, s

    def pair_rows(i):
        m = jax.tree_util.tree_map(lambda a: a[i], meas)
        dt = m.dt
        R1 = lie.quat_to_matrix(lie.quat_conj(q_all[i]))
        dp = p_all[i + 1] - p_all[i]
        A = jnp.zeros((6, n_cols), dtype)
        b = jnp.zeros(6, dtype)
        upd = jax.lax.dynamic_update_slice
        # velocity rows: −R1 v_i + R1 v_{i+1} − R1 g dt = ΔV
        A = upd(A, -R1, (0, 3 * i))
        A = upd(A, R1, (0, 3 * (i + 1)))
        A = A.at[0:3, 3 * K:3 * K + 3].set(-R1 * dt)
        b = b.at[0:3].set(pre.delta_velocity(m, bias_lin))
        # position rows: −R1 v_i dt − ½ R1 g dt² + R1 Δp s = ΔP
        A = upd(A, -R1 * dt, (3, 3 * i))
        A = A.at[3:6, 3 * K:3 * K + 3].set(-0.5 * R1 * dt * dt)
        A = A.at[3:6, 3 * K + 3].set(R1 @ dp)
        b = b.at[3:6].set(pre.delta_position(m, bias_lin))
        ok = valid_pair[i].astype(dtype)
        return A * ok, b * ok

    As, bs = jax.vmap(pair_rows)(jnp.arange(K - 1))
    A = As.reshape(n_rows, n_cols)
    b = bs.reshape(n_rows)
    if fix_scale:
        # move the scale column (s = 1) into the RHS
        b = b - A[:, -1]
        A = A.at[:, -1].set(0.0)
    sol = jnp.linalg.lstsq(A, b)[0]
    vel0 = sol[: 3 * K].reshape(K, 3)
    g_lin = sol[3 * K:3 * K + 3]
    s_lin = jnp.where(fix_scale, 1.0, jnp.maximum(sol[3 * K + 3], 1e-3))

    # gravity direction → 2-dof rotation from (0,0,−g): axis = ĝ0 × ĝ
    g_hat = g_lin / jnp.maximum(jnp.linalg.norm(g_lin), 1e-9)
    g0_hat = jnp.asarray([0.0, 0.0, -1.0], dtype)
    axis = jnp.cross(g0_hat, g_hat)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(g0_hat, g_hat)
    angle = jnp.arctan2(sin_a, cos_a)
    w_g = axis / jnp.maximum(sin_a, 1e-9) * angle

    # ---- stage C: joint GN refinement with |g| fixed at 9.81 ----
    x0 = jnp.zeros(9 + 3 * K, dtype)
    x0 = x0.at[0:2].set(w_g[:2])
    x0 = x0.at[2].set(jnp.where(fix_scale, 0.0, jnp.log(s_lin)))
    x0 = x0.at[3:6].set(bg0)
    x0 = x0.at[9:].set(vel0.reshape(-1))

    def step(carry, _):
        x, lam, _ = carry
        dx, cost = _weighted_gn_step(residuals, x, 9 + 3 * K, lam, dtype)
        x_new = x + dx
        r2, w2 = residuals(x_new)
        c_new = jnp.sum(w2 * r2 * r2)
        ok = (c_new < cost) & jnp.isfinite(c_new)
        x = jnp.where(ok, x_new, x)
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 5.0, 1e5))
        return (x, lam, jnp.where(ok, c_new, cost)), None

    (x, _, cost), _ = jax.lax.scan(step, (x0, jnp.asarray(1e-2, dtype), jnp.asarray(jnp.inf, dtype)), None, length=iterations)
    Rwg, s, bias, vel = unpack(x)
    return {"Rwg": Rwg, "scale": s, "bias": bias, "velocities": vel, "cost": cost}
