"""Sim3/SE3 pose-graph (essential graph) optimization.

Replaces ``Optimizer::OptimizeEssentialGraph`` (reference
``Optimizer.cc:1501-1784``): nodes are keyframe Sim3 poses S_iw, edges
are relative constraints S_ij (spanning tree, loop edges, strong
covisibility edges with weight ≥ 100), solved with Gauss-Newton.

TPU formulation: edge residuals r_e = log(S_ij · S_jw · S_iw⁻¹) with
Jacobians from forward-mode autodiff at the identity perturbation —
batched over all edges with ``vmap``; the normal equations assemble via
one-hot einsum into a dense (7K, 7K) system solved by Cholesky (pose
graphs are small: K ≲ 2k nodes; dense beats sparse on the MXU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie


class PoseGraphProblem(NamedTuple):
    nodes: jax.Array        # (K, 8) Sim3 S_iw (world→kf)
    node_fixed: jax.Array   # (K,) bool — e.g. the loop keyframe
    node_valid: jax.Array   # (K,) bool
    edge_i: jax.Array       # (E,) int32
    edge_j: jax.Array       # (E,) int32
    edge_Sij: jax.Array     # (E, 8) measured S_i←j = S_iw · S_jw⁻¹
    edge_weight: jax.Array  # (E,) f32 (information scale)
    edge_valid: jax.Array   # (E,) bool


def _edge_residual(Si: jax.Array, Sj: jax.Array, Sij: jax.Array,
                   tau_i: jax.Array, tau_j: jax.Array) -> jax.Array:
    """r = log( S_ij · (exp(τ_j)·S_jw) · (exp(τ_i)·S_iw)⁻¹ ) — (7,)."""
    Si_p = lie.sim3_mul(lie.sim3_exp(tau_i), Si)
    Sj_p = lie.sim3_mul(lie.sim3_exp(tau_j), Sj)
    return lie.sim3_log(lie.sim3_mul(Sij, lie.sim3_mul(Sj_p, lie.sim3_inv(Si_p))))


@functools.partial(jax.jit, static_argnames=("iterations", "fix_scale"))
def optimize_pose_graph(
    problem: PoseGraphProblem,
    iterations: int = 20,
    fix_scale: bool = False,
) -> jax.Array:
    """Gauss-Newton over all nodes; returns updated (K, 8) Sim3 nodes.

    ``fix_scale`` freezes every node's scale (SE3 pose graph / the
    reference's stereo-RGBD case where scale drift is zero).
    """
    K = problem.nodes.shape[0]
    dtype = problem.nodes.dtype
    zero7 = jnp.zeros(7, dtype)

    res_fn = jax.vmap(_edge_residual, in_axes=(0, 0, 0, None, None))
    Ji_fn = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(lambda t: _edge_residual(Si, Sj, Sij, t, zero7))(zero7)
    )
    Jj_fn = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(lambda t: _edge_residual(Si, Sj, Sij, zero7, t))(zero7)
    )

    free = (~problem.node_fixed) & problem.node_valid
    free7 = jnp.repeat(free, 7)
    if fix_scale:
        scale_mask = jnp.tile(jnp.array([1, 1, 1, 1, 1, 1, 0], bool), (K,))
        free7 = free7 & scale_mask

    w_e = jnp.where(problem.edge_valid,
                    problem.edge_weight.astype(dtype), jnp.zeros((), dtype))

    def edge_cost(nodes):
        r = res_fn(nodes[problem.edge_i], nodes[problem.edge_j],
                   problem.edge_Sij, zero7, zero7)
        return jnp.sum(w_e * jnp.sum(r * r, axis=-1))

    def body(_, carry):
        # damped accept/reject (LM): plain GN in f32 can diverge on an
        # ill-conditioned essential graph — a diverged correction wrote
        # ~1e18 keyframe poses on TPU before this guard
        nodes, lam = carry
        Si = nodes[problem.edge_i]
        Sj = nodes[problem.edge_j]
        r = res_fn(Si, Sj, problem.edge_Sij, zero7, zero7)     # (E, 7)
        Ji = Ji_fn(Si, Sj, problem.edge_Sij)                    # (E, 7, 7)
        Jj = Jj_fn(Si, Sj, problem.edge_Sij)
        w = w_e
        cost0 = jnp.sum(w * jnp.sum(r * r, axis=-1))

        oh_i = jax.nn.one_hot(problem.edge_i, K, dtype=dtype)   # (E, K)
        oh_j = jax.nn.one_hot(problem.edge_j, K, dtype=dtype)
        # stack both endpoint jacobians: J_full (E, 7, K, 7) implicit.
        # H = Σ_e (J_i ⊕ J_j)ᵀ w (J_i ⊕ J_j), assembled blockwise.
        def blocks(oh_a, Ja, oh_b, Jb):
            return jnp.einsum("ea,erm,e,eb,ern->ambn", oh_a, Ja, w, oh_b, Jb)

        H = (
            blocks(oh_i, Ji, oh_i, Ji)
            + blocks(oh_i, Ji, oh_j, Jj)
            + blocks(oh_j, Jj, oh_i, Ji)
            + blocks(oh_j, Jj, oh_j, Jj)
        ).reshape(7 * K, 7 * K)
        b = (
            jnp.einsum("ea,erm,e,er->am", oh_i, Ji, w, r)
            + jnp.einsum("ea,erm,e,er->am", oh_j, Jj, w, r)
        ).reshape(7 * K)

        H = jnp.where(free7[:, None] & free7[None, :], H, jnp.zeros((), dtype))
        H = H + lam * jnp.diag(jnp.diag(H))
        H = H + jnp.diag(jnp.where(free7, jnp.asarray(1e-6, dtype), jnp.asarray(1.0, dtype)))
        b = jnp.where(free7, b, jnp.zeros((), dtype))
        tau = -jnp.linalg.solve(H, b).reshape(K, 7)
        tau = jnp.where(free[:, None], tau, 0.0)
        if fix_scale:
            tau = tau.at[:, 6].set(0.0)
        new_nodes = lie.sim3_mul(lie.sim3_exp(tau), nodes)
        cost1 = edge_cost(new_nodes)
        ok = jnp.isfinite(cost1) & (cost1 < cost0)
        nodes = jnp.where(ok, new_nodes, nodes)
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        return nodes, lam

    nodes, _ = jax.lax.fori_loop(
        0, iterations, body, (problem.nodes, jnp.asarray(1e-4, dtype)))
    return nodes


def relative_sim3(nodes: jax.Array, i, j) -> jax.Array:
    """S_i←j = S_iw · S_jw⁻¹ for edge construction."""
    return lie.sim3_mul(nodes[i], lie.sim3_inv(nodes[j]))


# ---------------------------------------------------------------------------
# 4-DoF variant (inertial maps: gravity observable → roll/pitch/scale fixed)
# ---------------------------------------------------------------------------

def _edge_residual_right(Si: jax.Array, Sj: jax.Array, Sij: jax.Array,
                         tau_i: jax.Array, tau_j: jax.Array) -> jax.Array:
    """Right-perturbed residual: r = log(S_ij · S_jw·exp(τ_j) · (S_iw·exp(τ_i))⁻¹).

    Right-multiplying a world→kf pose perturbs it in the *world* frame, so a
    tangent with only ω_z rotates the node about the world z (gravity) axis —
    the yaw-only update of the reference's ``VertexPose4DoF``.
    """
    Si_p = lie.sim3_mul(Si, lie.sim3_exp(tau_i))
    Sj_p = lie.sim3_mul(Sj, lie.sim3_exp(tau_j))
    return lie.sim3_log(lie.sim3_mul(Sij, lie.sim3_mul(Sj_p, lie.sim3_inv(Si_p))))


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph_4dof(
    problem: PoseGraphProblem,
    iterations: int = 20,
) -> jax.Array:
    """4-DoF essential-graph GN: optimize translation + yaw-about-gravity only.

    Replaces ``Optimizer::OptimizeEssentialGraph4DoF`` (reference
    ``Optimizer.cc:5292+``, used by ``LoopClosing::CorrectLoop`` at
    ``LoopClosing.cc:1183`` once the IMU has made roll/pitch/scale
    observable). Nodes stay Sim3 (scale untouched, = 1 for inertial maps);
    the per-node update is δ = (tx, ty, tz, yaw_world).
    """
    K = problem.nodes.shape[0]
    dtype = problem.nodes.dtype
    # basis (7, 4): columns are [tx, ty, tz, yaw] in sim3 tangent coords
    B = jnp.zeros((7, 4), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0) \
        .at[2, 2].set(1.0).at[5, 3].set(1.0)
    zero4 = jnp.zeros(4, dtype)

    def edge_res4(Si, Sj, Sij, d_i, d_j):
        return _edge_residual_right(Si, Sj, Sij, B @ d_i, B @ d_j)

    res_fn = jax.vmap(edge_res4, in_axes=(0, 0, 0, None, None))
    Ji_fn = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(lambda d: edge_res4(Si, Sj, Sij, d, zero4))(zero4)
    )
    Jj_fn = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(lambda d: edge_res4(Si, Sj, Sij, zero4, d))(zero4)
    )

    free = (~problem.node_fixed) & problem.node_valid
    free4 = jnp.repeat(free, 4)

    w_e = jnp.where(problem.edge_valid,
                    problem.edge_weight.astype(dtype), jnp.zeros((), dtype))

    def edge_cost(nodes):
        r = res_fn(nodes[problem.edge_i], nodes[problem.edge_j],
                   problem.edge_Sij, zero4, zero4)
        return jnp.sum(w_e * jnp.sum(r * r, axis=-1))

    def body(_, carry):
        nodes, lam = carry
        Si = nodes[problem.edge_i]
        Sj = nodes[problem.edge_j]
        r = res_fn(Si, Sj, problem.edge_Sij, zero4, zero4)      # (E, 7)
        Ji = Ji_fn(Si, Sj, problem.edge_Sij)                     # (E, 7, 4)
        Jj = Jj_fn(Si, Sj, problem.edge_Sij)
        w = w_e
        cost0 = jnp.sum(w * jnp.sum(r * r, axis=-1))

        oh_i = jax.nn.one_hot(problem.edge_i, K, dtype=dtype)
        oh_j = jax.nn.one_hot(problem.edge_j, K, dtype=dtype)

        def blocks(oh_a, Ja, oh_b, Jb):
            return jnp.einsum("ea,erm,e,eb,ern->ambn", oh_a, Ja, w, oh_b, Jb)

        H = (
            blocks(oh_i, Ji, oh_i, Ji)
            + blocks(oh_i, Ji, oh_j, Jj)
            + blocks(oh_j, Jj, oh_i, Ji)
            + blocks(oh_j, Jj, oh_j, Jj)
        ).reshape(4 * K, 4 * K)
        b = (
            jnp.einsum("ea,erm,e,er->am", oh_i, Ji, w, r)
            + jnp.einsum("ea,erm,e,er->am", oh_j, Jj, w, r)
        ).reshape(4 * K)

        H = jnp.where(free4[:, None] & free4[None, :], H, jnp.zeros((), dtype))
        H = H + lam * jnp.diag(jnp.diag(H))
        H = H + jnp.diag(jnp.where(free4, jnp.asarray(1e-6, dtype), jnp.asarray(1.0, dtype)))
        b = jnp.where(free4, b, jnp.zeros((), dtype))
        delta = -jnp.linalg.solve(H, b).reshape(K, 4)
        delta = jnp.where(free[:, None], delta, 0.0)
        tau = delta @ B.T                                        # (K, 7)
        new_nodes = lie.sim3_mul(nodes, lie.sim3_exp(tau))
        cost1 = edge_cost(new_nodes)
        ok = jnp.isfinite(cost1) & (cost1 < cost0)
        nodes = jnp.where(ok, new_nodes, nodes)
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        return nodes, lam

    nodes, _ = jax.lax.fori_loop(
        0, iterations, body, (problem.nodes, jnp.asarray(1e-4, dtype)))
    return nodes
