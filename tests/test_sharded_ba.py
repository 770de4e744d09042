"""Distributed (landmark-sharded) BA on the virtual 8-device CPU mesh:
must reproduce the single-device Schur solve and actually shard."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.optim import local_ba
from orb_slam3_rgbl_tpu.parallel import mesh as mesh_mod
from orb_slam3_rgbl_tpu.parallel import sharded_ba
from test_local_ba import synth_ba, CAM, pose_rmse


def pad_problem_to(problem, M_target):
    """Pad landmark-major arrays to a shardable multiple."""
    M, D = problem.obs_kf.shape
    padn = M_target - M

    def pad(a, fill=0):
        out = np.full((M_target,) + a.shape[1:], fill, np.asarray(a).dtype)
        out[:M] = np.asarray(a)
        return jnp.asarray(out)

    return problem._replace(
        landmarks=pad(problem.landmarks),
        lm_valid=pad(problem.lm_valid, False),
        obs_kf=pad(problem.obs_kf),
        obs_uv=pad(problem.obs_uv),
        obs_ur=pad(problem.obs_ur, -1.0),
        obs_inv_sigma2=pad(problem.obs_inv_sigma2),
        obs_mask=pad(problem.obs_mask, False),
    )


class TestShardedBA:
    def test_matches_single_device(self, rng):
        problem, poses_gt, lms_gt, seen = synth_ba(rng, K=6, M=300, noise=0.2)
        problem = pad_problem_to(problem, 320)  # divisible by 8

        mesh = mesh_mod.make_mesh(8)
        run = sharded_ba.make_distributed_ba(mesh, CAM, iterations=12)
        sp = sharded_ba.shard_problem(problem, mesh)
        poses_d, lms_d = run(sp)

        res = local_ba.bundle_adjust(problem, CAM, iterations=12)
        # both should recover ground truth to similar accuracy
        err_dist = pose_rmse(np.asarray(poses_d), poses_gt)
        err_single = pose_rmse(np.asarray(res.poses), poses_gt)
        assert err_dist < 0.02, (err_dist, err_single)
        assert err_dist < max(3 * err_single, 5e-3)

    def test_distributed_pcg_matches_single_device(self, rng):
        from orb_slam3_rgbl_tpu.optim import global_ba

        problem, poses_gt, lms_gt, seen = synth_ba(rng, K=8, M=400, noise=0.2)
        problem = pad_problem_to(problem, 416)  # divisible by 8
        mesh = mesh_mod.make_mesh(8)
        run = sharded_ba.make_distributed_pcg_ba(mesh, CAM, iterations=8, cg_iters=25)
        sp = sharded_ba.shard_problem(problem, mesh)
        poses_d, lms_d = run(sp)
        res_single = global_ba.global_bundle_adjust(problem, CAM, iterations=8, cg_iters=25)
        e_dist = pose_rmse(np.asarray(poses_d), poses_gt)
        e_single = pose_rmse(np.asarray(res_single.poses), poses_gt)
        assert e_dist < 0.05, (e_dist, e_single)
        # identical algorithm ⇒ near-identical result up to reduction order
        assert abs(e_dist - e_single) < 0.02, (e_dist, e_single)

    def test_sharding_is_real(self, rng):
        problem, *_ = synth_ba(rng, K=6, M=300, noise=0.2)
        problem = pad_problem_to(problem, 320)
        mesh = mesh_mod.make_mesh(8)
        sp = sharded_ba.shard_problem(problem, mesh)
        # landmark arrays are split over 8 devices
        shards = sp.landmarks.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == 40
        run = sharded_ba.make_distributed_ba(mesh, CAM, iterations=3)
        poses_d, lms_d = run(sp)
        assert len(lms_d.addressable_shards) == 8
