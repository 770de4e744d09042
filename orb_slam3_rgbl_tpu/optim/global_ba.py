"""Global bundle adjustment: matrix-free preconditioned CG.

Replaces ``Optimizer::GlobalBundleAdjustemnt`` (reference
``Optimizer.cc:52-390``, run in the transient GBA thread after loop
closure / merge). The windowed Schur solver (``local_ba``) assembles an
explicit reduced camera system — fine for K ≲ 64 poses, but its one-hot
coupling term is O(M·K) memory, hopeless for full maps. Here the normal
equations are never materialized: each CG iteration applies

    H·v = Jᵀ W (J v) + λ D v

through the observation table (gathers + segment-sums — all dense,
shape-stable TPU ops), with a block-Jacobi preconditioner (6×6 pose /
3×3 landmark inverses). This is the classic inexact-LM / iterative-Schur
trade: O(obs) work per iteration, O(K + M) memory, and the landmark axis
shards cleanly over a mesh (psum on the pose-block reductions only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import PinholeCamera
from orb_slam3_rgbl_tpu.optim.local_ba import BAProblem, _linearize
from orb_slam3_rgbl_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO


class GBAResult(NamedTuple):
    poses: jax.Array
    landmarks: jax.Array
    obs_inlier: jax.Array
    cost: jax.Array


def _segment_pose_sum(values, obs_kf, K):
    """(M, D, 6) per-observation pose-space values → (K, 6) via scatter-add."""
    flat = values.reshape(-1, values.shape[-1])
    idx = obs_kf.reshape(-1)
    return jnp.zeros((K, values.shape[-1]), values.dtype).at[idx].add(flat)


@functools.partial(jax.jit, static_argnames=("cam", "iterations", "cg_iters", "huber_iters"))
def global_bundle_adjust(
    problem: BAProblem,
    cam: PinholeCamera,
    iterations: int = 8,
    cg_iters: int = 24,
    huber_iters: int = 5,
) -> GBAResult:
    """LM outer loop with PCG inner solves over the full (pose, landmark)
    state. Fixed/invalid poses and invalid landmarks are projected out of
    the Krylov space by masking."""
    K = problem.poses.shape[0]
    M, D = problem.obs_kf.shape
    dtype = problem.poses.dtype

    pose_free = ((~problem.pose_fixed) & problem.pose_valid)[:, None]      # (K, 1)
    lm_free = problem.lm_valid[:, None]                                     # (M, 1)

    def body(it, carry):
        poses, lms, lam = carry
        P = problem._replace(poses=poses, landmarks=lms)
        use_huber = it < huber_iters
        r, Jp, Jl, w, chi2, active, cost = _linearize(P, cam, use_huber, jnp.ones_like(problem.obs_mask))
        # gradient g = Jᵀ W r
        wr = w[..., None] * r                                              # (M, D, 3)
        g_p = _segment_pose_sum(jnp.einsum("mdij,mdi->mdj", Jp, wr), P.obs_kf, K)
        g_l = jnp.einsum("mdij,mdi->mj", Jl, wr)
        g_p = g_p * pose_free
        g_l = g_l * lm_free

        # block-Jacobi preconditioner (damped diagonal blocks)
        wJp = w[..., None, None] * Jp
        Hpp_diag = _segment_pose_sum(
            jnp.einsum("mdij,mdik->mdjk", wJp, Jp).reshape(M, D, 36), P.obs_kf, K
        ).reshape(K, 6, 6)
        Hll_diag = jnp.einsum("mdij,md,mdik->mjk", Jl, w, Jl)
        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp_d = Hpp_diag + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp_diag)) + 1e-7 * eye6
        Hll_d = Hll_diag + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hll_diag)) + 1e-7 * eye3
        Minv_p = jnp.linalg.inv(jnp.where(pose_free[..., None], Hpp_d, eye6))
        Minv_l = jnp.linalg.inv(jnp.where(lm_free[..., None], Hll_d, eye3))

        lam_p = lam * jax.vmap(jnp.diag)(Hpp_diag) + 1e-7   # (K, 6) damping diag
        lam_l = lam * jax.vmap(jnp.diag)(Hll_diag) + 1e-7   # (M, 3)

        def H_apply(v_p, v_l):
            # J v
            vp_obs = v_p[P.obs_kf]                                          # (M, D, 6)
            Jv = jnp.einsum("mdij,mdj->mdi", Jp, vp_obs) + jnp.einsum(
                "mdij,mj->mdi", Jl, v_l
            )
            wJv = w[..., None] * Jv
            Hp = _segment_pose_sum(jnp.einsum("mdij,mdi->mdj", Jp, wJv), P.obs_kf, K)
            Hl = jnp.einsum("mdij,mdi->mj", Jl, wJv)
            Hp = (Hp + lam_p * v_p) * pose_free
            Hl = (Hl + lam_l * v_l) * lm_free
            return Hp, Hl

        def precond(v_p, v_l):
            return (
                jnp.einsum("kij,kj->ki", Minv_p, v_p) * pose_free,
                jnp.einsum("mij,mj->mi", Minv_l, v_l) * lm_free,
            )

        def dot(a, b):
            return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

        # PCG for H x = −g
        b_p, b_l = -g_p, -g_l
        x = (jnp.zeros_like(b_p), jnp.zeros_like(b_l))
        rr = (b_p, b_l)
        z = precond(*rr)
        p = z
        rz = dot(rr, z)

        def cg_step(_, st):
            x, rr, p, rz = st
            Ap = H_apply(*p)
            alpha = rz / jnp.maximum(dot(p, Ap), 1e-20)
            x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
            rr = (rr[0] - alpha * Ap[0], rr[1] - alpha * Ap[1])
            z = precond(*rr)
            rz_new = dot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = (z[0] + beta * p[0], z[1] + beta * p[1])
            return x, rr, p, rz_new

        x, *_ = jax.lax.fori_loop(0, cg_iters, cg_step, (x, rr, p, rz))
        dp, dl = x

        new_poses = lie.se3_normalize(lie.se3_mul(lie.se3_exp(dp), poses))
        new_lms = lms + dl
        P2 = problem._replace(poses=new_poses, landmarks=new_lms)
        *_, active2, cost_new = _linearize(P2, cam, use_huber, jnp.ones_like(problem.obs_mask))
        # reject diverged steps: NaN or an emptied active set collapses
        # the cost to 0 and would otherwise be accepted
        accept = ((cost_new < cost) & jnp.isfinite(cost_new)
                  & (2 * jnp.sum(active2) >= jnp.sum(active)))
        poses = jnp.where(accept, new_poses, poses)
        lms = jnp.where(accept, new_lms, lms)
        lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-8), jnp.minimum(lam * 5.0, 1e4))
        return poses, lms, lam

    poses, lms, _ = jax.lax.fori_loop(
        0, iterations, body, (problem.poses, problem.landmarks, jnp.asarray(1e-3, dtype))
    )

    P = problem._replace(poses=poses, landmarks=lms)
    r, _, _, _, chi2, active, cost = _linearize(P, cam, False, jnp.ones_like(problem.obs_mask))
    th = jnp.where(problem.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)
    inlier = active & (chi2 <= th)
    return GBAResult(poses=poses, landmarks=lms, obs_inlier=inlier, cost=cost)
