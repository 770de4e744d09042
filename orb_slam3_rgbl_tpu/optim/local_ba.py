"""Bundle adjustment with landmark Schur complement — the BA core.

Replaces ``Optimizer::LocalBundleAdjustment`` (reference
``Optimizer.cc:1116-1500``) and ``GlobalBundleAdjustemnt/BundleAdjustment``
(``Optimizer.cc:52-390``), which build a g2o sparse graph and run sparse-
Schur LM. TPUs hate general sparsity, but BA's sparsity is *structured*
(arrow-head): eliminate the landmark blocks (embarrassingly parallel 3×3
solves via ``vmap``) and the reduced camera system is small and dense —
exactly what the MXU wants.

Layout (fixed capacity, masked):

* poses:      (K, 7) SE3 world→camera; ``pose_fixed`` (K,) bool —
  gauge/observer keyframes (reference's ``vpFixedCameras``).
* landmarks:  (M, 3); ``lm_valid`` (M,) bool.
* observations grouped **by landmark**: (M, D) — each landmark sees at
  most D keyframes (``obs_kf`` index, uv / u_right / inv_sigma2 / mask).
  This makes landmark elimination a batched dense contraction with NO
  scatters: the per-landmark camera coupling matrix G_m is built with a
  one-hot einsum and the Schur cross term is one big MXU matmul.

The Schur complement S = U − G V⁻¹ Gᵀ is assembled as C = G·chol(V⁻¹)
followed by S_cross = Σ_m C_m C_mᵀ — an (M·3)-contraction matmul. For the
distributed global BA, landmarks shard over the mesh and S/b reduce with
``psum`` (see ``parallel/sharded_ba.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import (
    PinholeCamera, geo_project, geo_project_jacobian, is_fisheye,
)
from orb_slam3_rgbl_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, HUBER_MONO, HUBER_STEREO


class BAProblem(NamedTuple):
    """A fixed-shape bundle adjustment problem instance."""

    poses: jax.Array       # (K, 7) Tcw
    pose_fixed: jax.Array  # (K,) bool — not optimized (still constrain points)
    pose_valid: jax.Array  # (K,) bool
    landmarks: jax.Array   # (M, 3)
    lm_valid: jax.Array    # (M,) bool
    obs_kf: jax.Array      # (M, D) int32 keyframe index of each observation
    obs_uv: jax.Array      # (M, D, 2)
    obs_ur: jax.Array      # (M, D) pseudo-stereo column or −1 (mono)
    obs_inv_sigma2: jax.Array  # (M, D)
    obs_mask: jax.Array    # (M, D) bool


class BAResult(NamedTuple):
    poses: jax.Array
    landmarks: jax.Array
    obs_inlier: jax.Array  # (M, D) final chi2 classification
    cost: jax.Array


def _linearize(problem: BAProblem, cam, use_huber: bool, obs_active: jax.Array):
    """Residuals + Jacobians for all (M, D) observations.

    Returns r (M,D,3), Jp (M,D,3,6), Jl (M,D,3,3), weights w (M,D),
    chi2 (M,D), and the per-observation active mask. ``cam`` is any
    geometric model (pinhole | KB8 — the reference edges project through
    ``GeometricCamera``, G2oTypes.h:74-817); fisheye observations carry
    no pseudo-stereo row."""
    P = problem
    T_obs = P.poses[P.obs_kf]          # (M, D, 7)
    X = P.landmarks[:, None, :]        # (M, 1, 3)
    pc = lie.se3_apply(T_obs, jnp.broadcast_to(X, T_obs.shape[:-1] + (3,)))  # (M, D, 3)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / safe_z
    uv_hat = geo_project(cam, pc)
    u_hat, v_hat = uv_hat[..., 0], uv_hat[..., 1]

    is_stereo = P.obs_ur >= 0
    if is_fisheye(cam):
        is_stereo = jnp.zeros_like(is_stereo)
        ur_hat = jnp.zeros_like(u_hat)
    else:
        ur_hat = u_hat - cam.bf * inv_z
    r = jnp.stack(
        [
            P.obs_uv[..., 0] - u_hat,
            P.obs_uv[..., 1] - v_hat,
            jnp.where(is_stereo, P.obs_ur - ur_hat, 0.0),
        ],
        axis=-1,
    )

    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(z)
    # d(u,v,uR)/d(pc) — (M, D, 3, 3)
    Juv = geo_project_jacobian(cam, pc)
    row_u = Juv[..., 0, :]
    row_v = Juv[..., 1, :]
    if is_fisheye(cam):
        row_r = jnp.zeros_like(row_u)
    else:
        row_r = row_u + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    Jproj = jnp.stack([row_u, row_v, row_r], axis=-2)

    R_obs = lie.quat_to_matrix(lie.se3_rot(T_obs))  # (M, D, 3, 3)
    # pose: left-multiplicative tangent — d(pc)/dδ = [I | −[pc]×]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    dpc_dpose = jnp.concatenate([eye, -lie.so3_hat(pc)], axis=-1)  # (M, D, 3, 6)
    Jp = -Jproj @ dpc_dpose
    Jl = -Jproj @ R_obs  # d(pc)/dX = R

    mono_rows = jnp.array([1.0, 1.0, 0.0], dtype=pc.dtype)
    stereo_row = jnp.where(
        is_stereo[..., None, None],
        jnp.ones((), dtype=pc.dtype),
        mono_rows[None, None, :, None],
    )
    Jp = Jp * stereo_row
    Jl = Jl * stereo_row

    depth_ok = z > 1e-3
    considered = obs_active & P.obs_mask & P.lm_valid[:, None] & P.pose_valid[P.obs_kf]
    active = considered & depth_ok
    chi2 = jnp.sum(r * r, axis=-1) * P.obs_inv_sigma2
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_rob = jnp.where(use_huber & (e > delta), delta / e, 1.0)
    w = jnp.where(active, P.obs_inv_sigma2 * w_rob, 0.0)
    # an observation thrown BEHIND the camera must cost the chi² cap, not
    # vanish: otherwise a weakly-constrained pose can "improve" the cost
    # by flying away and de-activating its own residuals (observed: poses
    # at ~1e14 transiently accepted, then pulled back by a later solve —
    # with frames logged against the garbage in between)
    cost = (jnp.sum(jnp.where(active, jnp.minimum(chi2, 1e7) * w_rob, 0.0))
            + 1e7 * jnp.sum(considered & ~depth_ok))
    return r, Jp, Jl, w, chi2, active, cost


def _build_and_solve(problem: BAProblem, cam, r, Jp, Jl, w, lam, n_poses: int):
    """One damped Schur step: returns (delta_poses (K,6), delta_lms (M,3))."""
    P = problem
    K = n_poses
    M, D = P.obs_kf.shape
    dtype = r.dtype

    wJp = w[..., None, None] * Jp                      # (M, D, 3, 6)
    # U: pose blocks — one-hot einsum instead of scatter
    onehot = jax.nn.one_hot(P.obs_kf, K, dtype=dtype)  # (M, D, K)
    U = jnp.einsum("mdk,mdij,mdil->kjl", onehot, wJp, Jp)       # (K, 6, 6)
    b_p = jnp.einsum("mdk,mdij,mdi->kj", onehot, wJp, r)        # (K, 6)

    V = jnp.einsum("mdij,md,mdil->mjl", Jl, w, Jl)              # (M, 3, 3)
    b_l = jnp.einsum("mdij,md,mdi->mj", Jl, w, r)               # (M, 3)
    Wpl = jnp.einsum("mdij,md,mdil->mdjl", Jp, w, Jl)           # (M, D, 6, 3)

    # damp V and invert per landmark (keep identity for empty landmarks)
    V_d = V + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)) + 1e-8 * jnp.eye(3, dtype=dtype))
    has_lm = P.lm_valid
    V_d = jnp.where(has_lm[:, None, None], V_d, jnp.eye(3, dtype=dtype))
    Vinv = jnp.linalg.inv(V_d)

    # per-landmark pose coupling G_m = Σ_d onehot ⊗ Wpl → (M, K, 6, 3)
    G = jnp.einsum("mdk,mdjl->mkjl", onehot, Wpl)
    # C = G · chol(Vinv): Schur cross = Σ_m C Cᵀ  (single MXU contraction)
    L = jnp.linalg.cholesky(Vinv + 1e-12 * jnp.eye(3, dtype=dtype))
    C = jnp.einsum("mkjl,mlp->mkjp", G, L)
    C2 = C.reshape(M, K * 6, 3).transpose(1, 0, 2).reshape(K * 6, M * 3)
    S_cross = C2 @ C2.T                                          # (K6, K6)

    # reduced RHS
    Vinv_bl = jnp.einsum("mjl,ml->mj", Vinv, b_l)
    b_cross = jnp.einsum("mkjl,ml->kj", G, Vinv_bl)

    U_damped = U + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U))
    S_full = jnp.zeros((K * 6, K * 6), dtype)
    idx = jnp.arange(K)
    # place U blocks on the diagonal
    S_full = S_full.reshape(K, 6, K, 6).at[idx, :, idx, :].set(U_damped).reshape(K * 6, K * 6)
    S_full = S_full - S_cross
    rhs = (b_p - b_cross).reshape(K * 6)

    # fixed / invalid poses: identity rows+cols, zero rhs
    free = (~P.pose_fixed) & P.pose_valid
    free6 = jnp.repeat(free, 6)
    S_full = jnp.where(free6[:, None] & free6[None, :], S_full, 0.0)
    S_full = S_full + jnp.diag(jnp.where(free6, 1e-9, 1.0))
    rhs = jnp.where(free6, rhs, 0.0)

    delta_p = -jnp.linalg.solve(S_full, rhs).reshape(K, 6)

    # back-substitution: δl = −V⁻¹ (b_l + Σ_d Wᵀ δp)  (sign: H δ = −b)
    dp_obs = delta_p[P.obs_kf]  # (M, D, 6)
    Wt_dp = jnp.einsum("mdjl,mdj->ml", Wpl, dp_obs)
    delta_l = -jnp.einsum("mjl,ml->mj", Vinv, b_l + Wt_dp)
    delta_l = jnp.where(has_lm[:, None], delta_l, 0.0)
    return delta_p, delta_l


@functools.partial(jax.jit, static_argnames=("cam", "iterations", "huber_iters"))
def bundle_adjust(
    problem: BAProblem,
    cam: PinholeCamera,
    iterations: int = 10,
    huber_iters: int = 7,
    n_iters=None,
) -> BAResult:
    """Damped Gauss-Newton (LM) with landmark Schur elimination.

    Mirrors the reference local BA protocol (``Optimizer.cc:1116-1500``):
    ~10 abortable iterations with Huber, then outlier classification at
    chi2 thresholds and a writeback. Accept/reject per iteration keeps the
    solve monotone (branchless — both candidates evaluated).

    ``n_iters``: optional TRACED iteration count ≤ ``iterations`` — the
    abortable-BA analog (reference ``mbAbortBA``): the mapping plane
    throttles the budget at runtime without compiling a new executable
    (``iterations`` is static — every distinct value is a fresh program).
    """
    K = problem.poses.shape[0]
    dtype = problem.poses.dtype
    chi2_th = jnp.where(problem.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)
    n_iters_t = (jnp.asarray(iterations, jnp.int32) if n_iters is None
                 else jnp.asarray(n_iters, jnp.int32))

    def body(carry):
        it, poses, lms, lam, obs_active, _ = carry
        P = problem._replace(poses=poses, landmarks=lms)
        use_huber = it < huber_iters
        r, Jp, Jl, w, chi2, active, cost = _linearize(P, cam, use_huber, obs_active)
        dp, dl = _build_and_solve(P, cam, r, Jp, Jl, w, lam, K)
        new_poses = lie.se3_normalize(lie.se3_mul(lie.se3_exp(dp), poses))
        new_lms = lms + dl
        P2 = P._replace(poses=new_poses, landmarks=new_lms)
        _, _, _, _, chi2_new, active2, cost_new = _linearize(
            P2, cam, use_huber, obs_active)
        # a diverged step can throw every point behind the camera (or go
        # NaN): active empties, cost collapses to 0 and would "win" —
        # accept only finite steps that keep the active set alive
        n_act = jnp.sum(active)
        n_act2 = jnp.sum(active2)
        accept = (cost_new < cost) & jnp.isfinite(cost_new) & (2 * n_act2 >= n_act)
        poses = jnp.where(accept, new_poses, poses)
        lms = jnp.where(accept, new_lms, lms)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10), jnp.minimum(lam * 4.0, 1e4))

        # mid-solve outlier culling (reference Optimizer.cc:1404-1421: drop
        # chi2 > th after the robust phase, continue without them). chi2
        # is Huber-independent, so the accepted state's chi2 is already in
        # hand from the two linearizations above — no third one needed.
        cull_now = it == (huber_iters - 1)
        chi2_now = jnp.where(accept, chi2_new, chi2)
        new_active = jnp.where(cull_now, obs_active & (chi2_now <= 2.0 * chi2_th), obs_active)
        return (it + 1, poses, lms, lam, new_active,
                jnp.where(accept, cost_new, cost))

    # while_loop with a TRACED trip count: the iteration budget varies at
    # runtime (mapping-pressure throttle) without a recompile per value
    _, poses, lms, _, obs_active, cost = jax.lax.while_loop(
        lambda c: c[0] < n_iters_t, body,
        (jnp.asarray(0, jnp.int32), problem.poses, problem.landmarks,
         jnp.asarray(1e-4, dtype),
         jnp.asarray(problem.obs_mask), jnp.asarray(jnp.inf, dtype)),
    )

    # final classification (reference: chi2>5.991/7.815 or negative depth → erase)
    P = problem._replace(poses=poses, landmarks=lms)
    r, _, _, _, chi2, active, _ = _linearize(P, cam, False, jnp.ones_like(problem.obs_mask))
    th = jnp.where(problem.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)
    inlier = active & (chi2 <= th)
    return BAResult(poses=poses, landmarks=lms, obs_inlier=inlier, cost=cost)
