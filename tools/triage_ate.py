"""ATE triage harness (round 5, VERDICT #2): run the soak/bench two-lap
box world on CPU under toggled subsystems to bisect the error source:

    python tools/triage_ate.py <mode> [n_frames]

modes: full        — async mapping + loop closing + GBA (bench regime)
       noloop      — loop closing OFF (pure odometry + local mapping)
       nogba       — loop closing ON, global BA OFF
       sync        — synchronous mapping plane (no async races)
       nopg        — loop detection + fusion ON, pose graph OFF

Prints a per-frame error profile + stage report + a single JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize pre-imports jax with JAX_PLATFORMS=axon (remote TPU) —
# the env var alone is too late; force CPU through jax.config (the same
# dance as tests/conftest.py). TRIAGE_TPU=1 keeps the real device.
os.environ["JAX_PLATFORMS"] = os.environ.get(
    "TRIAGE_TPU", "0") == "1" and "axon" or "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", ".jax_cache"),
)
import jax  # noqa: E402

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cadence = int(os.environ.get("TRIAGE_CADENCE", "4"))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orb_slam3_rgbl_tpu import synthetic as syn
    from orb_slam3_rgbl_tpu.geometry.align import ate_rmse
    from orb_slam3_rgbl_tpu.slam.system import System
    from orb_slam3_rgbl_tpu.slam import map_state as ms
    from orb_slam3_rgbl_tpu.utils.profiling import StageTimer
    from orb_slam3_rgbl_tpu.utils import logging as slam_log

    slam_log.set_level(1)

    cfg = syn.synthetic_rgbl_config()
    if mode == "noloop":
        cfg = dataclasses.replace(cfg, loop_closing=False)
    if os.environ.get("TRIAGE_WORLD", "small") == "bench":
        # EXACT bench_engine geometry (KITTI regime, radius-22 box) —
        # reproduces the TPU cadence bench's trajectory on CPU
        from orb_slam3_rgbl_tpu.config import kitti_rgbl_config

        cfg = kitti_rgbl_config()
        if mode == "noloop":
            cfg = dataclasses.replace(cfg, loop_closing=False)
        cam = cfg.camera
        radius = 22.0
        w = syn.make_box_world(0, tex_size=512, half=radius + 14.0)
        traj = syn.multi_loop_trajectory(
            n_frames, radius=radius, period=max((n_frames + 8) // 2, 40))
        traj[:, 4] -= radius
    else:
        cam = cfg.camera
        w = syn.make_box_world(0, tex_size=256)
        traj = syn.multi_loop_trajectory(n_frames, radius=6.0,
                                         period=max((n_frames + 8) // 2, 40))
        traj[:, 4] -= 6.0
    cam = cfg.camera

    sysm = System(cfg)
    sysm.CLOUD_CAP = 16384
    sysm.async_mapping = mode != "sync"
    timer = StageTimer()
    sysm.timer = timer

    states = []
    kf_frames = []
    for i, Twc in enumerate(traj):
        T = jnp.asarray(Twc)
        img = np.asarray(syn.render_image(
            w, T, cam.fx, cam.fy, cam.cx, cam.cy, cam.height, cam.width))
        pts = np.asarray(syn.lidar_scan(w, T, n_az=256, n_el=48))
        r = sysm.track_rgbl(img, pts, i * 0.1)
        states.append(r.state)
        if r.created_kf:
            kf_frames.append(i)
        if i == 20 and cadence > 0 and sysm.tracker is not None:
            sysm.tracker.force_kf_every = cadence
            sysm.tracker.deferred_kf = 0
        if i == 20 and sysm.loop_closer is not None:
            if mode == "nogba":
                sysm.loop_closer.run_gba = False
            if mode == "nopg":
                orig = sysm.loop_closer._correct_loop
                sysm.loop_closer._correct_loop = (
                    lambda ev, run_pose_graph=True: orig(
                        ev, run_pose_graph=False))
    sysm.shutdown()

    est = sysm.trajectory()
    gt = traj[: len(est)]
    err = float(ate_rmse(jnp.asarray(est[:, 4:7]),
                         jnp.asarray(gt[:, 4:7] - gt[0, 4:7])))
    per_err = np.linalg.norm(est[:, 4:7] - (gt[:, 4:7] - gt[0, 4:7]), axis=1)
    n_loops = len(sysm.loop_closer.events) if sysm.loop_closer else 0
    issues = ms.check_binding_consistency(sysm.map)
    ok_frac = float(np.mean([s == 2 for s in states]))
    print(timer.report(), file=sys.stderr)
    # error trace every 10 frames: where does it blow up?
    prof = [round(float(x), 2) for x in per_err[::10]]
    print(f"[{mode}] err trace (every 10th frame): {prof}", file=sys.stderr)
    print(json.dumps({
        "mode": mode, "ate_m": round(err, 3),
        "p50": round(float(np.percentile(per_err, 50)), 2),
        "p90": round(float(np.percentile(per_err, 90)), 2),
        "max": round(float(per_err.max()), 2),
        "argmax": int(np.argmax(per_err)),
        "ok_frac": round(ok_frac, 3),
        "n_kf": int(sysm.map.kf_valid.sum()),
        "deferred": int(sysm.tracker.deferred_kf),
        "loops": n_loops,
        "issues": issues,
    }))


if __name__ == "__main__":
    main()
