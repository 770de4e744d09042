"""Offline global-BA probe (round-5 ATE forensics): load a saved bench
map (``BENCH_SAVE``), run the whole-map solve EXACTLY as the engine
does, and measure keyframe-pose accuracy against ground truth before and
after — isolating "GBA warps the map" from every timing/concurrency
effect.

Run: python tools/gba_probe.py /tmp/map_r5.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.align import ate_rmse
from orb_slam3_rgbl_tpu.optim import global_ba
from orb_slam3_rgbl_tpu.slam import ba_assembly
from orb_slam3_rgbl_tpu.slam.frame import inv_scale_sigma2
from orb_slam3_rgbl_tpu.slam import map_state as ms
from orb_slam3_rgbl_tpu.utils import serialization


def kf_ate(m, valid, gt_traj):
    """Sim3-free rigid-aligned RMSE of keyframe centers vs GT."""
    fids = m.kf_frame_id[valid].astype(int)
    est_c = lie.np_se3_centers(m.kf_pose[valid])
    gt_c = gt_traj[fids, 4:7] - gt_traj[0, 4:7]
    return float(ate_rmse(jnp.asarray(est_c), jnp.asarray(gt_c)))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/map_r5.npz"
    cfg = kitti_rgbl_config()
    m = serialization.load_map(path)
    gt = np.load(path + ".gt.npz")["traj"]
    valid = m.valid_kf_ids()
    print(f"map: {valid.size} KFs, {int(m.lm_valid.sum())} landmarks")
    print("binding issues:", ms.check_binding_consistency(m))
    print("reproj before:", ms.debug_reprojection_error(m, cfg.camera))
    print(f"KF ATE before GBA: {kf_ate(m, valid, gt):.3f} m")

    inv_s2 = np.asarray(inv_scale_sigma2(cfg.orb.n_levels, cfg.orb.scale_factor))
    problem, window, lm_ids, obs_kf, obs_feat = ba_assembly.build_full_problem(
        m, inv_s2, min_pose_tier=256, min_lm_tier=8192)
    dropped = getattr(m, "last_dropped_obs", 0)
    print(f"problem: {len(window)} poses, {len(lm_ids)} landmarks, "
          f"{int(np.asarray(problem.obs_mask).sum())} observations, "
          f"{dropped} dropped beyond cap")
    poses, lms = problem.poses, problem.landmarks
    for it in range(3):
        res = global_ba.global_bundle_adjust(
            problem._replace(poses=poses, landmarks=lms), cfg.camera,
            iterations=2)
        poses, lms = res.poses, res.landmarks
        m2_pose = m.kf_pose.copy()
        m2_pose[window] = np.asarray(poses, np.float32)[: len(window)]
        est_c = lie.np_se3_centers(m2_pose[valid])
        fids = m.kf_frame_id[valid].astype(int)
        gt_c = gt[fids, 4:7] - gt[0, 4:7]
        err = float(ate_rmse(jnp.asarray(est_c), jnp.asarray(gt_c)))
        print(f"after {2*(it+1)} LM iters: KF ATE {err:.3f} m, "
              f"cost {float(res.cost):.1f}")
    # apply + reprojection after
    m.kf_pose[window] = np.asarray(poses, np.float32)[: len(window)]
    ok = m.lm_valid[lm_ids]
    m.lm_pos[lm_ids[ok]] = np.asarray(lms, np.float32)[: len(lm_ids)][ok]
    print("reproj after:", ms.debug_reprojection_error(m, cfg.camera))


if __name__ == "__main__":
    main()
