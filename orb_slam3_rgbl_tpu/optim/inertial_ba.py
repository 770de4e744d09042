"""Sliding-window visual-inertial bundle adjustment.

Replaces ``Optimizer::LocalInertialBA`` (reference ``Optimizer.cc:2383``:
Opt=10 recent temporal keyframes + Fix=5 older/covisible anchors, 15-DoF
states [pose, velocity, gyro bias, accel bias], reprojection +
``EdgeInertial`` preintegration factors + ``EdgeGyroRW/EdgeAccRW`` bias
random-walk factors, sparse-Schur LM) and ``FullInertialBA``
(``Optimizer.cc:392``, same factors over every keyframe — called by the
VIBA1/VIBA2 refinement schedule of ``LocalMapping.cc:218-256`` and after
loop closure).

TPU formulation: states live in a fixed (K, 15) window; landmarks are
Schur-eliminated exactly as in :mod:`optim.local_ba` (batched 3×3
inversions + one MXU contraction), with the pose blocks widened to 15 —
the visual Jacobian occupies columns 0:6, the inertial factors (Jacobians
by ``jacfwd`` over the tiny 30-dim pair states — XLA fuses them into the
residual kernels) fill the full blocks of consecutive pairs. The reduced
system is (K·15)² dense — trivial for the window sizes involved.

States are BODY poses ``Twb`` (world←body); the camera sees through the
fixed extrinsic ``T_cb``. Gravity is the world −z axis (maps are
re-expressed gravity-down by IMU initialization, ``Map::ApplyScaledRotation``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry import camera as cam_mod
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera
from orb_slam3_rgbl_tpu.imu import preintegration as pre
from orb_slam3_rgbl_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, HUBER_MONO, HUBER_STEREO

S = 15  # state tangent dim: [pose(6), vel(3), bg(3), ba(3)]


class VIBAProblem(NamedTuple):
    """Fixed-shape sliding-window VI-BA instance (masked)."""

    Twb: jax.Array          # (K, 7) body→world poses
    vel: jax.Array          # (K, 3) world velocities
    bg: jax.Array           # (K, 3) gyro biases
    ba: jax.Array           # (K, 3) accel biases
    state_fixed: jax.Array  # (K,) bool — anchors (poses+vel+bias frozen)
    state_valid: jax.Array  # (K,) bool
    T_cb: jax.Array         # (7,) body→camera extrinsic
    landmarks: jax.Array    # (M, 3)
    lm_valid: jax.Array     # (M,)
    obs_kf: jax.Array       # (M, D) window-slot index per observation
    obs_uv: jax.Array       # (M, D, 2)
    obs_ur: jax.Array       # (M, D)
    obs_inv_sigma2: jax.Array  # (M, D)
    obs_mask: jax.Array     # (M, D)
    pair_i: jax.Array       # (P,) first slot of each temporal IMU factor
    pair_j: jax.Array       # (P,) second slot
    pair_meas: pre.Preintegrated  # stacked (P, ...) preintegrations i→j
    pair_valid: jax.Array   # (P,)
    info_bg: jax.Array      # (P,) gyro-walk information
    info_ba: jax.Array      # (P,) accel-walk information


class VIBAResult(NamedTuple):
    Twb: jax.Array
    vel: jax.Array
    bg: jax.Array
    ba: jax.Array
    landmarks: jax.Array
    obs_inlier: jax.Array
    cost: jax.Array


def _apply_state_delta(P: VIBAProblem, dx: jax.Array):
    """dx (K, 15) → updated state arrays (left-mult pose tangent)."""
    Twb = lie.se3_normalize(lie.se3_mul(lie.se3_exp(dx[:, 0:6]), P.Twb))
    return P._replace(Twb=Twb, vel=P.vel + dx[:, 6:9], bg=P.bg + dx[:, 9:12],
                      ba=P.ba + dx[:, 12:15])


def _visual_linearize(P: VIBAProblem, cam: PinholeCamera, use_huber, obs_active):
    """Reprojection residuals through Tcw = T_cb · Twb⁻¹.

    Perturbation: Twb ← exp(δ)·Twb ⇒ dX_b/dδ = −R_bw·[I | −[X]×] with X
    the WORLD point, so dpc/dδpose = −R_cw·[I | −[X]×]."""
    T_bw = lie.se3_inv(P.Twb)                       # (K, 7)
    T_cw = lie.se3_mul(P.T_cb[None, :], T_bw)       # (K, 7)
    T_obs = T_cw[P.obs_kf]                          # (M, D, 7)
    X = jnp.broadcast_to(P.landmarks[:, None, :], P.obs_kf.shape + (3,))
    pc = lie.se3_apply(T_obs, X)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / safe_z
    # camera-model-generic projection (pinhole | KB8 — reference
    # G2oTypes EdgeMono/EdgeStereo project through GeometricCamera)
    uv_hat = cam_mod.geo_project(cam, pc)
    u_hat, v_hat = uv_hat[..., 0], uv_hat[..., 1]
    if cam_mod.is_fisheye(cam):
        is_stereo = jnp.zeros_like(P.obs_ur >= 0)
        ur_hat = jnp.zeros_like(u_hat)
    else:
        is_stereo = P.obs_ur >= 0
        ur_hat = u_hat - cam.bf * inv_z
    r = jnp.stack([
        P.obs_uv[..., 0] - u_hat,
        P.obs_uv[..., 1] - v_hat,
        jnp.where(is_stereo, P.obs_ur - ur_hat, 0.0),
    ], axis=-1)

    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(z)
    Juv = cam_mod.geo_project_jacobian(cam, pc)
    row_u = Juv[..., 0, :]
    row_v = Juv[..., 1, :]
    if cam_mod.is_fisheye(cam):
        row_r = jnp.zeros_like(row_u)
    else:
        row_r = row_u + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    Jproj = jnp.stack([row_u, row_v, row_r], axis=-2)   # (M, D, 3, 3)

    R_cw = lie.quat_to_matrix(lie.se3_rot(T_obs))       # (M, D, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    dXb = jnp.concatenate([eye, -lie.so3_hat(X)], axis=-1)  # (M, D, 3, 6)
    # r = obs − proj ⇒ J = −dproj = −Jproj·(−R_cw·dXb) = +Jproj·R_cw·dXb
    Jpose = Jproj @ R_cw @ dXb                          # (M, D, 3, 6)
    Jl = -Jproj @ R_cw                                  # d(pc)/dX = R_cw

    mono_rows = jnp.array([1.0, 1.0, 0.0], dtype=pc.dtype)
    sel = jnp.where(is_stereo[..., None, None], jnp.ones((), pc.dtype),
                    mono_rows[None, None, :, None])
    Jpose = Jpose * sel
    Jl = Jl * sel

    active = (obs_active & P.obs_mask & (z > 1e-3)
              & P.lm_valid[:, None] & P.state_valid[P.obs_kf])
    chi2 = jnp.sum(r * r, axis=-1) * P.obs_inv_sigma2
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_rob = jnp.where(use_huber & (e > delta), delta / e, 1.0)
    w = jnp.where(active, P.obs_inv_sigma2 * w_rob, 0.0)
    cost = jnp.sum(jnp.where(active, jnp.minimum(chi2, 1e7) * w_rob, 0.0))
    return r, Jpose, Jl, w, chi2, active, cost


def _inertial_linearize(P: VIBAProblem):
    """Per-pair 15-residual stack [preint(9), bias-walk(6)] with Jacobians
    w.r.t. the two 15-dim states (forward-mode autodiff — 30 columns)."""
    dtype = P.Twb.dtype

    def pair_res(dx, i, j, meas_idx):
        m = jax.tree_util.tree_map(lambda a: a[meas_idx], P.pair_meas)
        d1, d2 = dx[:S], dx[S:]
        T1 = lie.se3_mul(lie.se3_exp(d1[0:6]), P.Twb[i])
        T2 = lie.se3_mul(lie.se3_exp(d2[0:6]), P.Twb[j])
        v1 = P.vel[i] + d1[6:9]
        v2 = P.vel[j] + d2[6:9]
        b1 = pre.ImuBias(P.bg[i] + d1[9:12], P.ba[i] + d1[12:15])
        b2g = P.bg[j] + d2[9:12]
        b2a = P.ba[j] + d2[12:15]
        r_in = pre.inertial_residual(
            m, lie.se3_rot(T1), v1, lie.se3_trans(T1),
            lie.se3_rot(T2), v2, lie.se3_trans(T2), b1,
        )
        r_bw = jnp.concatenate([b2g - b1.bg, b2a - b1.ba])
        return jnp.concatenate([r_in, r_bw])

    def one(pi):
        i, j = P.pair_i[pi], P.pair_j[pi]
        z = jnp.zeros(2 * S, dtype)
        r = pair_res(z, i, j, pi)
        J = jax.jacfwd(pair_res)(z, i, j, pi)
        m_cov = jnp.diagonal(P.pair_meas.cov[pi])
        info_in = jnp.minimum(1.0 / jnp.maximum(m_cov, 1e-10), 1e8)
        w = jnp.concatenate([
            info_in,
            jnp.full(3, P.info_bg[pi], dtype), jnp.full(3, P.info_ba[pi], dtype),
        ])
        w = jnp.where(P.pair_valid[pi], w, 0.0)
        return r, J, w

    r, J, w = jax.vmap(one)(jnp.arange(P.pair_i.shape[0]))
    cost = jnp.sum(w * r * r)
    return r, J, w, cost     # (P, 15), (P, 15, 30), (P, 15)


def _build_and_solve(P: VIBAProblem, r, Jp, Jl, w,
                     r_in, J_in, w_in, lam):
    """Damped joint step: landmark Schur + dense reduced state system."""
    K = P.Twb.shape[0]
    M, D = P.obs_kf.shape
    dtype = r.dtype

    # widen visual pose Jacobians to the 15-dim state blocks (cols 0:6)
    pad = jnp.zeros(Jp.shape[:-1] + (S - 6,), dtype)
    Jp15 = jnp.concatenate([Jp, pad], axis=-1)          # (M, D, 3, 15)

    wJp = w[..., None, None] * Jp15
    onehot = jax.nn.one_hot(P.obs_kf, K, dtype=dtype)   # (M, D, K)
    U = jnp.einsum("mdk,mdij,mdil->kjl", onehot, wJp, Jp15)   # (K, 15, 15)
    b_s = jnp.einsum("mdk,mdij,mdi->kj", onehot, wJp, r)      # (K, 15)

    V = jnp.einsum("mdij,md,mdil->mjl", Jl, w, Jl)
    b_l = jnp.einsum("mdij,md,mdi->mj", Jl, w, r)
    Wpl = jnp.einsum("mdij,md,mdil->mdjl", Jp15, w, Jl)       # (M, D, 15, 3)

    V_d = V + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V))
               + 1e-8 * jnp.eye(3, dtype=dtype))
    V_d = jnp.where(P.lm_valid[:, None, None], V_d, jnp.eye(3, dtype=dtype))
    Vinv = jnp.linalg.inv(V_d)

    G = jnp.einsum("mdk,mdjl->mkjl", onehot, Wpl)             # (M, K, 15, 3)
    L = jnp.linalg.cholesky(Vinv + 1e-12 * jnp.eye(3, dtype=dtype))
    C = jnp.einsum("mkjl,mlp->mkjp", G, L)
    C2 = C.reshape(M, K * S, 3).transpose(1, 0, 2).reshape(K * S, M * 3)
    S_cross = C2 @ C2.T
    Vinv_bl = jnp.einsum("mjl,ml->mj", Vinv, b_l)
    b_cross = jnp.einsum("mkjl,ml->kj", G, Vinv_bl)

    # inertial contributions: scatter pair blocks into the dense system
    oh_i = jax.nn.one_hot(P.pair_i, K, dtype=dtype)           # (P, K)
    oh_j = jax.nn.one_hot(P.pair_j, K, dtype=dtype)
    J1 = J_in[..., :S]                                        # (P, 15, 15)
    J2 = J_in[..., S:]
    wJ1 = w_in[..., None] * J1
    wJ2 = w_in[..., None] * J2
    H11 = jnp.einsum("pk,pij,pil->kjl", oh_i, wJ1, J1)
    H22 = jnp.einsum("pk,pij,pil->kjl", oh_j, wJ2, J2)
    b1 = jnp.einsum("pk,pij,pi->kj", oh_i, wJ1, r_in)
    b2 = jnp.einsum("pk,pij,pi->kj", oh_j, wJ2, r_in)
    # off-diagonal (i, j) blocks
    H12 = jnp.einsum("pij,pil->pjl", wJ1, J2)                 # (P, 15, 15)
    oh_ij = jnp.einsum("pk,pl->pkl", oh_i, oh_j)              # (P, K, K)
    H_off = jnp.einsum("pkl,pjm->kjlm", oh_ij, H12)           # (K, 15, K, 15)

    U_tot = U + H11 + H22
    U_damped = U_tot + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U_tot))
    idx = jnp.arange(K)
    Hfull = jnp.zeros((K, S, K, S), dtype)
    Hfull = Hfull.at[idx, :, idx, :].set(U_damped)
    Hfull = Hfull + H_off + H_off.transpose(2, 3, 0, 1)
    Hfull = Hfull.reshape(K * S, K * S) - S_cross
    rhs = (b_s + b1 + b2 - b_cross).reshape(K * S)

    free = (~P.state_fixed) & P.state_valid
    freeS = jnp.repeat(free, S)
    Hfull = jnp.where(freeS[:, None] & freeS[None, :], Hfull, 0.0)
    Hfull = Hfull + jnp.diag(jnp.where(freeS, 1e-7, 1.0))
    rhs = jnp.where(freeS, rhs, 0.0)

    dx = -jnp.linalg.solve(Hfull, rhs).reshape(K, S)
    dx_obs = dx[P.obs_kf]                                     # (M, D, 15)
    Wt_dx = jnp.einsum("mdjl,mdj->ml", Wpl, dx_obs)
    dl = -jnp.einsum("mjl,ml->mj", Vinv, b_l + Wt_dx)
    dl = jnp.where(P.lm_valid[:, None], dl, 0.0)
    return dx, dl


@functools.partial(jax.jit, static_argnames=("cam", "iterations", "huber_iters"))
def vi_bundle_adjust(problem: VIBAProblem, cam: PinholeCamera,
                     iterations: int = 8, huber_iters: int = 5) -> VIBAResult:
    """Damped joint GN over window states + landmarks (LM accept/reject),
    following the reference protocol: robust phase → outlier cull →
    final chi2 classification."""
    dtype = problem.Twb.dtype
    chi2_th = jnp.where(problem.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)

    def total_cost(P, use_huber, obs_active):
        *_, cost_v = _visual_linearize(P, cam, use_huber, obs_active)
        *_, cost_i = _inertial_linearize(P)
        return cost_v + cost_i

    def body(it, carry):
        P, lam, obs_active, _ = carry
        use_huber = it < huber_iters
        r, Jp, Jl, w, chi2, active, cost_v = _visual_linearize(P, cam, use_huber, obs_active)
        r_in, J_in, w_in, cost_i = _inertial_linearize(P)
        dx, dl = _build_and_solve(P, r, Jp, Jl, w, r_in, J_in, w_in, lam)
        P_new = _apply_state_delta(P, dx)._replace(landmarks=P.landmarks + dl)
        c_new = total_cost(P_new, use_huber, obs_active)
        # reject diverged (NaN / cost-collapse) steps
        accept = (c_new < cost_v + cost_i) & jnp.isfinite(c_new)
        P = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a) if a.dtype != bool else a, P, P_new)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                        jnp.minimum(lam * 4.0, 1e4))
        cull_now = it == (huber_iters - 1)
        r3, *_ = _visual_linearize(P, cam, False, obs_active)
        chi2_now = jnp.sum(r3 * r3, axis=-1) * problem.obs_inv_sigma2
        obs_active = jnp.where(cull_now,
                               obs_active & (chi2_now <= 2.0 * chi2_th), obs_active)
        return P, lam, obs_active, jnp.where(accept, c_new, cost_v + cost_i)

    P, _, obs_active, cost = jax.lax.fori_loop(
        0, iterations, body,
        (problem, jnp.asarray(1e-3, dtype), jnp.asarray(problem.obs_mask),
         jnp.asarray(jnp.inf, dtype)),
    )
    r, _, _, _, chi2, active, _ = _visual_linearize(
        P, cam, False, jnp.ones_like(problem.obs_mask))
    th = jnp.where(problem.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)
    return VIBAResult(Twb=P.Twb, vel=P.vel, bg=P.bg, ba=P.ba,
                      landmarks=P.landmarks,
                      obs_inlier=active & (chi2 <= th), cost=cost)
