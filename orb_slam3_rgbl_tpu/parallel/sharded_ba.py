"""Distributed global bundle adjustment: landmark-sharded Schur.

Replaces the reference's single-thread ``GlobalBundleAdjustemnt``
(``Optimizer.cc:52-390``, run in the transient GBA thread
``LoopClosing.cc:1206``) with the SURVEY §7.7 design:

* landmarks (and their observation rows) shard across the mesh axis
  ``lm``; each device eliminates its landmark blocks independently
  (3×3 inversions are embarrassingly parallel);
* the reduced camera Hessian S (K·6 × K·6) and RHS are ``psum``-reduced
  over ICI;
* the small reduced solve runs replicated; back-substitution is local to
  each shard.

One collective pair per LM iteration — communication is O(K²), never
O(M), so scaling efficiency follows the landmark count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.optim import local_ba
from orb_slam3_rgbl_tpu.optim.local_ba import BAProblem
from orb_slam3_rgbl_tpu.parallel.mesh import LM_AXIS


def _local_contributions(P_: BAProblem, cam, use_huber, lam):
    """Per-shard: linearize local landmarks and form the local pieces of
    the reduced camera system. Returns (S_local, rhs_local, aux...)."""
    K = P_.poses.shape[0]
    M, D = P_.obs_kf.shape
    dtype = P_.poses.dtype

    r, Jp, Jl, w, chi2, active, cost = local_ba._linearize(
        P_, cam, use_huber, jnp.ones_like(P_.obs_mask)
    )
    wJp = w[..., None, None] * Jp
    onehot = jax.nn.one_hot(P_.obs_kf, K, dtype=dtype)
    U = jnp.einsum("mdk,mdij,mdil->kjl", onehot, wJp, Jp)
    b_p = jnp.einsum("mdk,mdij,mdi->kj", onehot, wJp, r)
    V = jnp.einsum("mdij,md,mdil->mjl", Jl, w, Jl)
    b_l = jnp.einsum("mdij,md,mdi->mj", Jl, w, r)
    Wpl = jnp.einsum("mdij,md,mdil->mdjl", Jp, w, Jl)

    V_d = V + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)) + 1e-8 * jnp.eye(3, dtype=dtype)
    V_d = jnp.where(P_.lm_valid[:, None, None], V_d, jnp.eye(3, dtype=dtype))
    Vinv = jnp.linalg.inv(V_d)

    G = jnp.einsum("mdk,mdjl->mkjl", onehot, Wpl)
    L = jnp.linalg.cholesky(Vinv + 1e-12 * jnp.eye(3, dtype=dtype))
    C = jnp.einsum("mkjl,mlp->mkjp", G, L)
    C2 = C.reshape(M, K * 6, 3).transpose(1, 0, 2).reshape(K * 6, M * 3)
    S_cross = C2 @ C2.T
    Vinv_bl = jnp.einsum("mjl,ml->mj", Vinv, b_l)
    b_cross = jnp.einsum("mkjl,ml->kj", G, Vinv_bl)

    U_d = U + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U))
    idx = jnp.arange(K)
    S_diag = jnp.zeros((K, 6, K, 6), dtype).at[idx, :, idx, :].set(U_d).reshape(K * 6, K * 6)
    S_local = S_diag - S_cross
    rhs_local = (b_p - b_cross).reshape(K * 6)
    return S_local, rhs_local, Vinv, b_l, Wpl, cost


def _apply_step(P_: BAProblem, delta_p, Vinv, b_l, Wpl):
    dp_obs = delta_p[P_.obs_kf]
    Wt_dp = jnp.einsum("mdjl,mdj->ml", Wpl, dp_obs)
    delta_l = -jnp.einsum("mjl,ml->mj", Vinv, b_l + Wt_dp)
    delta_l = jnp.where(P_.lm_valid[:, None], delta_l, 0.0)
    new_poses = lie.se3_normalize(lie.se3_mul(lie.se3_exp(delta_p), P_.poses))
    new_lms = P_.landmarks + delta_l
    return new_poses, new_lms


def make_distributed_ba(mesh: Mesh, cam, iterations: int = 10, huber_iters: int = 7):
    """REFERENCE/TEST-ONLY dense-Schur variant — NOT the production path.

    Forms and ``psum``s the dense (K·6)² reduced camera system every
    iteration: at KITTI scale (K≈1.4k) that is a ~280 MB collective per
    iteration, which cannot scale. It exists as the numerically-exact
    oracle the PCG path is validated against (``tests/test_sharded_ba.py``).
    Production multi-device BA is :func:`make_distributed_pcg_ba` —
    O(K·6) communication per CG iteration.

    The returned function takes a BAProblem whose landmark-major arrays
    are sharded along ``lm`` (poses replicated) and returns updated
    (poses, landmarks) with the same shardings.
    """
    lm_sharded = NamedSharding(mesh, P(LM_AXIS))
    repl = NamedSharding(mesh, P())

    def problem_shardings(p: BAProblem) -> BAProblem:
        return BAProblem(
            poses=repl, pose_fixed=repl, pose_valid=repl,
            landmarks=lm_sharded, lm_valid=lm_sharded,
            obs_kf=lm_sharded, obs_uv=lm_sharded, obs_ur=lm_sharded,
            obs_inv_sigma2=lm_sharded, obs_mask=lm_sharded,
        )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(BAProblem(
            poses=P(), pose_fixed=P(), pose_valid=P(),
            landmarks=P(LM_AXIS), lm_valid=P(LM_AXIS),
            obs_kf=P(LM_AXIS), obs_uv=P(LM_AXIS), obs_ur=P(LM_AXIS),
            obs_inv_sigma2=P(LM_AXIS), obs_mask=P(LM_AXIS),
        ),),
        out_specs=(P(), P(LM_AXIS)),
    )
    def ba_shard(problem: BAProblem):
        dtype = problem.poses.dtype
        free = (~problem.pose_fixed) & problem.pose_valid
        free6 = jnp.repeat(free, 6)

        def body(it, carry):
            poses, lms, lam = carry
            Pl = problem._replace(poses=poses, landmarks=lms)
            use_huber = it < huber_iters
            S_loc, rhs_loc, Vinv, b_l, Wpl, _ = _local_contributions(Pl, cam, use_huber, lam)
            # ---- the collective: reduce the camera system over shards ----
            S = jax.lax.psum(S_loc, LM_AXIS)
            rhs = jax.lax.psum(rhs_loc, LM_AXIS)
            S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
            S = S + jnp.diag(jnp.where(free6, 1e-9, 1.0))
            rhs = jnp.where(free6, rhs, 0.0)
            delta_p = -jnp.linalg.solve(S, rhs).reshape(-1, 6)
            new_poses, new_lms = _apply_step(Pl, delta_p, Vinv, b_l, Wpl)
            return new_poses, new_lms, lam * 0.7

        poses, lms, _ = jax.lax.fori_loop(
            0, iterations, body,
            (problem.poses, problem.landmarks, jnp.asarray(1e-4, dtype)),
        )
        return poses, lms

    @jax.jit
    def run(problem: BAProblem):
        return ba_shard(problem)

    return run


def make_distributed_pcg_ba(mesh: Mesh, cam, iterations: int = 8, cg_iters: int = 24,
                            huber_iters: int = 5):
    """Distributed matrix-free PCG global BA (the scalable path —
    see ``optim/global_ba.py`` for the single-device derivation).

    Landmark-major arrays shard along ``lm``; pose-space reductions
    (gradient blocks, preconditioner blocks, H·v pose half, CG dot
    products) ``psum`` over ICI — communication per CG iteration is
    O(K·6) + two scalars, independent of the landmark count. Landmark
    state stays fully local to its shard.
    """
    from orb_slam3_rgbl_tpu.optim import global_ba as gba
    from orb_slam3_rgbl_tpu.optim.local_ba import _linearize

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(BAProblem(
            poses=P(), pose_fixed=P(), pose_valid=P(),
            landmarks=P(LM_AXIS), lm_valid=P(LM_AXIS),
            obs_kf=P(LM_AXIS), obs_uv=P(LM_AXIS), obs_ur=P(LM_AXIS),
            obs_inv_sigma2=P(LM_AXIS), obs_mask=P(LM_AXIS),
        ),),
        out_specs=(P(), P(LM_AXIS)),
    )
    def ba_shard(problem: BAProblem):
        K = problem.poses.shape[0]
        M, D = problem.obs_kf.shape
        dtype = problem.poses.dtype
        pose_free = ((~problem.pose_fixed) & problem.pose_valid)[:, None]
        lm_free = problem.lm_valid[:, None]

        def psum(x):
            return jax.lax.psum(x, LM_AXIS)

        def body(it, carry):
            poses, lms, lam = carry
            Pl = problem._replace(poses=poses, landmarks=lms)
            use_huber = it < huber_iters
            r, Jp, Jl, w, chi2, active, cost_loc = _linearize(
                Pl, cam, use_huber, jnp.ones_like(problem.obs_mask)
            )
            cost = psum(cost_loc)
            wr = w[..., None] * r
            g_p = psum(gba._segment_pose_sum(jnp.einsum("mdij,mdi->mdj", Jp, wr), Pl.obs_kf, K))
            g_l = jnp.einsum("mdij,mdi->mj", Jl, wr)
            g_p = g_p * pose_free
            g_l = g_l * lm_free

            wJp = w[..., None, None] * Jp
            Hpp_diag = psum(gba._segment_pose_sum(
                jnp.einsum("mdij,mdik->mdjk", wJp, Jp).reshape(M, D, 36), Pl.obs_kf, K
            )).reshape(K, 6, 6)
            Hll_diag = jnp.einsum("mdij,md,mdik->mjk", Jl, w, Jl)
            eye6 = jnp.eye(6, dtype=dtype)
            eye3 = jnp.eye(3, dtype=dtype)
            Hpp_d = Hpp_diag + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp_diag)) + 1e-7 * eye6
            Hll_d = Hll_diag + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hll_diag)) + 1e-7 * eye3
            Minv_p = jnp.linalg.inv(jnp.where(pose_free[..., None], Hpp_d, eye6))
            Minv_l = jnp.linalg.inv(jnp.where(lm_free[..., None], Hll_d, eye3))
            lam_p = lam * jax.vmap(jnp.diag)(Hpp_diag) + 1e-7
            lam_l = lam * jax.vmap(jnp.diag)(Hll_diag) + 1e-7

            def H_apply(v_p, v_l):
                vp_obs = v_p[Pl.obs_kf]
                Jv = jnp.einsum("mdij,mdj->mdi", Jp, vp_obs) + jnp.einsum("mdij,mj->mdi", Jl, v_l)
                wJv = w[..., None] * Jv
                Hp = psum(gba._segment_pose_sum(jnp.einsum("mdij,mdi->mdj", Jp, wJv), Pl.obs_kf, K))
                Hl = jnp.einsum("mdij,mdi->mj", Jl, wJv)
                return (Hp + lam_p * v_p) * pose_free, (Hl + lam_l * v_l) * lm_free

            def precond(v_p, v_l):
                return (
                    jnp.einsum("kij,kj->ki", Minv_p, v_p) * pose_free,
                    jnp.einsum("mij,mj->mi", Minv_l, v_l) * lm_free,
                )

            def dot(a, b):
                # pose half is replicated; landmark half is shard-local
                return jnp.sum(a[0] * b[0]) + psum(jnp.sum(a[1] * b[1]))

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
            *_, active2, cost_new_loc = _linearize(P2, cam, use_huber, jnp.ones_like(problem.obs_mask))
            cost_new = psum(cost_new_loc)
            # reject diverged steps — NaN comparisons are False, but an
            # emptied active set collapses the cost to 0 and would win
            n2 = psum(jnp.sum(active2).astype(cost_new.dtype))
            accept = (cost_new < cost) & jnp.isfinite(cost_new) & (n2 > 0)
            poses = jnp.where(accept, new_poses, poses)
            lms = jnp.where(accept, new_lms, lms)
            lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-8), jnp.minimum(lam * 5.0, 1e4))
            return poses, lms, lam

        poses, lms, _ = jax.lax.fori_loop(
            0, iterations, body,
            (problem.poses, problem.landmarks, jnp.asarray(1e-3, problem.poses.dtype)),
        )
        return poses, lms

    @jax.jit
    def run(problem: BAProblem):
        return ba_shard(problem)

    return run


def shard_problem(problem: BAProblem, mesh: Mesh) -> BAProblem:
    """Place a host BAProblem onto the mesh with landmark sharding."""
    lm_sharded = NamedSharding(mesh, P(LM_AXIS))
    repl = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return BAProblem(
        poses=put(problem.poses, repl),
        pose_fixed=put(problem.pose_fixed, repl),
        pose_valid=put(problem.pose_valid, repl),
        landmarks=put(problem.landmarks, lm_sharded),
        lm_valid=put(problem.lm_valid, lm_sharded),
        obs_kf=put(problem.obs_kf, lm_sharded),
        obs_uv=put(problem.obs_uv, lm_sharded),
        obs_ur=put(problem.obs_ur, lm_sharded),
        obs_inv_sigma2=put(problem.obs_inv_sigma2, lm_sharded),
        obs_mask=put(problem.obs_mask, lm_sharded),
    )
