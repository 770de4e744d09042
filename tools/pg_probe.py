"""Pose-graph correction probe (round-5 ATE forensics): does
``optimize_pose_graph`` actually RELAX a bench-shaped loop problem?

Builds the cadence bench's keyframe graph synthetically — two laps of a
radius-22 circle, K nodes, odometry drift accumulating along the chain —
with structural edges measured from the DRIFTED estimates (exactly what
``_essential_edges`` does) and loop edges carrying the TRUE relative
Sim3 between revisit pairs. Reports node position error vs ground truth
before/after the solve, at several iteration counts.

Run: JAX_PLATFORMS=cpu python tools/pg_probe.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.optim import pose_graph


def build(K=64, radius=22.0, laps=2.0, drift_per_step=0.04, seed=0):
    rng = np.random.default_rng(seed)
    # ground-truth camera poses on the circle (look tangentially)
    th = np.linspace(0, 2 * np.pi * laps, K, endpoint=False)
    centers = np.stack([radius * np.cos(th), np.zeros(K), radius * np.sin(th)], 1)
    gt = []
    for i in range(K):
        fwd = np.array([-np.sin(th[i]), 0.0, np.cos(th[i])])
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)            # right-handed x×y=z
        Rwc = np.stack([right, down, fwd], 1)  # cam axes in world
        Tcw = np.concatenate([
            np.asarray(lie.matrix_to_quat(jnp.asarray(Rwc.T.astype(np.float32)))),
            -Rwc.T @ centers[i]]).astype(np.float32)
        gt.append(Tcw)
    gt = np.stack(gt)
    # drifted estimates: odometry-style accumulated yaw error — node i's
    # pose rotates about the start by i·dyaw and its center drifts
    # linearly (matches the noloop bench's ~2.5 m end drift)
    from scipy.spatial.transform import Rotation as _R

    c0 = centers[0]
    est = []
    for i in range(K):
        dR = _R.from_rotvec([0.0, 0.0012 * i, 0.0]).as_matrix()
        q = np.asarray(gt[i][:4])
        Rcw = np.asarray(lie.np_quat_to_matrix(q)) if hasattr(lie, "np_quat_to_matrix") \
            else np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
        Rwc = Rcw.T
        c = centers[i]
        Rwc_e = dR @ Rwc
        c_e = dR @ (c - c0) + c0 + i * np.asarray(
            [drift_per_step, 0.0, drift_per_step / 2])
        Rcw_e = Rwc_e.T
        Tcw = np.concatenate([
            np.asarray(lie.matrix_to_quat(jnp.asarray(Rcw_e.astype(np.float32)))),
            (-Rcw_e @ c_e).astype(np.float32)]).astype(np.float32)
        est.append(Tcw)
    est = np.stack(est)

    nodes = np.concatenate([est, np.ones((K, 1), np.float32)], 1)
    # structural edges from DRIFTED estimates (chain + skip-2)
    ei, ej, Sij, w = [], [], [], []
    Sn = nodes.copy()
    for i in range(1, K):
        for j in (i - 1, i - 2):
            if j < 0:
                continue
            ei.append(i); ej.append(j)
            Sij.append(lie.np_sim3_mul(Sn[i], lie.np_sim3_inv(Sn[j])))
            w.append(1.0)
    # loop edges: revisit pairs (i on lap2, j = i - K/laps) with TRUE Sim3
    half = int(K / laps)
    matched = half + 2          # first revisit detection
    loops = [(matched, 2)]
    gtn = np.concatenate([gt, np.ones((K, 1), np.float32)], 1)
    for (a, b) in loops:
        ei.append(a); ej.append(b)
        Sij.append(lie.np_sim3_mul(gtn[a], lie.np_sim3_inv(gtn[b])))
        w.append(10.0)
    fixed = np.zeros(K, bool)
    fixed[loops[0][1]] = True   # matched (old) node held
    return gt, est, nodes, (ei, ej, Sij, w), fixed


def err_vs_gt(poses, gt):
    c = lie.np_se3_centers(poses)
    cg = lie.np_se3_centers(gt)
    return np.linalg.norm(c - cg, axis=1)


def main():
    gt, est, nodes, (ei, ej, Sij, w), fixed = build()
    K = len(gt)
    e0 = err_vs_gt(est, gt)
    print(f"before: mean {e0.mean():.3f} max {e0.max():.3f}")
    E = len(ei)
    prob = pose_graph.PoseGraphProblem(
        nodes=jnp.asarray(nodes),
        node_fixed=jnp.asarray(fixed),
        node_valid=jnp.ones(K, bool),
        edge_i=jnp.asarray(np.asarray(ei, np.int32)),
        edge_j=jnp.asarray(np.asarray(ej, np.int32)),
        edge_Sij=jnp.asarray(np.stack(Sij)),
        edge_weight=jnp.asarray(np.asarray(w, np.float32)),
        edge_valid=jnp.ones(E, bool),
    )
    for iters in (10, 20, 50, 100):
        out = np.asarray(pose_graph.optimize_pose_graph(
            prob, iterations=iters, fix_scale=True))
        e1 = err_vs_gt(lie.np_sim3_to_se3(out), gt)
        print(f"after {iters:3d} iters: mean {e1.mean():.3f} max {e1.max():.3f}")


if __name__ == "__main__":
    main()
