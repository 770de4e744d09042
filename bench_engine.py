"""ENGINE benchmark: sustained frames/s of the REAL ``System.track_rgbl``
loop — mapping, fusion, local BA, and loop closing all ON — not just the
fused kernel (that is `rgbl_frame_step_fps`).

Input regime matches KITTI RGB-L (1241×376 gray, 131k-point clouds, 2000
ORB features, 8 levels, InverseDilation Diamond-5). Frames are rendered
ON DEVICE by the synthetic ray-cast world (zero host↔device image/cloud
traffic — the measurement tunnel's ~14 MB/s would otherwise dominate; a
deployment streams sensor data over PCIe).

Default mode (round 4): REFERENCE KEYFRAME CADENCE — a closed box world
driven in two laps (~300 frames) with a keyframe FORCED every 4 frames
(the reference's NeedNewKeyFrame density on real KITTI, ~1 KF per 3-5
frames, Tracking.cc:3098-3249 — synthetic worlds track too well to reach
it naturally), the async mapping plane ON, and ≥1 full loop closure
(retrieval → Sim3 → essential graph → GBA) inside the timed window.
Reports sustained FPS, ATE, keyframes per 100 frames, busy-gate-deferred
insertions (must be ~0 — deferrals mean the mapping plane is thinning
the map to keep up), and loop-event count.

Method: pre-render F frames on device with exact ground truth; warm up
over the first W frames AND force-compile the classic fallback ladder
(the tunnel TPU backend does not persist executables, so every program
must compile inside this process before the clock starts); time the
remaining frames wall-clock (each frame's control loop downloads the
pose, so the clock sees completed work).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np


def run_engine_bench(n_frames: int = 300, warmup: int = 40,
                     cadence: int = 4,
                     log=lambda *a: print(*a, file=sys.stderr)) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("BENCH_LOG_COMPILES", "0") == "1":
        # audit mid-run compiles (VERDICT r4 #3): every compile inside the
        # timed window is a stall — the log timestamps identify which
        # program escaped the prewarm inventory
        import logging

        jax.config.update("jax_log_compiles", True)
        logging.basicConfig(level=logging.INFO)
        for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
                     "jax._src.pjit", "jax._src.compiler"):
            logging.getLogger(name).setLevel(logging.INFO)

    from orb_slam3_rgbl_tpu.utils import logging as slam_log

    slam_log.set_level(int(os.environ.get("BENCH_VERBOSE", "1")))

    from orb_slam3_rgbl_tpu import synthetic as syn
    from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
    from orb_slam3_rgbl_tpu.geometry.align import ate_rmse
    from orb_slam3_rgbl_tpu.slam.system import System
    from orb_slam3_rgbl_tpu.utils.profiling import StageTimer

    cfg = kitti_rgbl_config()
    if os.environ.get("BENCH_LOOP", "1") == "0":
        import dataclasses

        cfg = dataclasses.replace(cfg, loop_closing=False)
    cam = cfg.camera
    if cadence > 0:
        # closed box world, two laps → the revisit fires a full loop
        # closure inside the timed window
        radius = 22.0
        world = syn.make_box_world(0, tex_size=512, half=radius + 14.0)
        period = max((n_frames + 8) // 2, 40)
        traj = syn.multi_loop_trajectory(n_frames, radius=radius,
                                         period=period)
        traj[:, 4] -= radius   # center the circle inside the box
    else:
        world = syn.make_world(0, tex_size=512, half_width=10.0, far_z=150.0)
        traj = syn.straight_trajectory(n_frames, step=1.0, weave=0.5)

    # ---- pre-render all frames on device (no host round-trips) ----------
    t0 = time.perf_counter()
    imgs, clouds = [], []
    for Twc in traj:
        T = jnp.asarray(Twc)
        imgs.append(syn.render_image(world, T, cam.fx, cam.fy, cam.cx, cam.cy,
                                     cam.height, cam.width))
        clouds.append(syn.lidar_scan(world, T, n_az=1024, n_el=128))
    jax.block_until_ready(imgs[-1])
    log(f"rendered {n_frames} frames in {time.perf_counter()-t0:.1f}s "
        f"on {jax.devices()[0]}")

    if os.environ.get("BENCH_VOCAB", "lsh") == "tree":
        # trained DBoW2-equivalent k-ary vocabulary in the real engine
        # loop (VERDICT r5 #8): train on descriptors extracted from a
        # spread of this run's own frames — the reference trains ORBvoc
        # offline the same way, on survey imagery
        import tempfile

        from orb_slam3_rgbl_tpu.slam import frame as frame_mod
        from orb_slam3_rgbl_tpu.retrieval.tree_vocab import train_vocabulary

        t0 = time.perf_counter()
        docs = []
        for i in range(0, min(n_frames, 96), 8):
            f = frame_mod.extract_features(
                imgs[i], cam.height, cam.width,
                n_features=cfg.orb.n_features, n_levels=cfg.orb.n_levels,
                scale_factor=cfg.orb.scale_factor,
                ini_th=float(cfg.orb.ini_th_fast),
                min_th=float(cfg.orb.min_th_fast))
            d, v = jax.device_get((f.desc, f.valid))
            docs.append(np.asarray(d)[np.asarray(v)])
        voc = train_vocabulary(np.concatenate(docs), k=8, depth=3, seed=0,
                               idf_docs=docs)
        vp = os.path.join(tempfile.gettempdir(), "bench_tree_vocab.npz")
        voc.save(vp)
        import dataclasses

        cfg = dataclasses.replace(cfg, vocab_path=vp)
        log(f"tree vocab: trained {voc.n_words} words in "
            f"{time.perf_counter()-t0:.1f}s")

    sysm = System(cfg)
    sysm.CLOUD_CAP = int(clouds[0].shape[0])
    if os.environ.get("BENCH_ASYNC_MAPPING", "1") == "1":
        sysm.async_mapping = True   # the reference's mapping-thread analog
    timer = StageTimer()
    sysm.timer = timer

    # ---- warmup: compiles + map bootstrap -------------------------------
    t0 = time.perf_counter()
    for i in range(warmup - 3):
        sysm.track_rgbl(imgs[i], clouds[i], i * 0.1)
        if i == 0 and sysm.mapper is not None:
            # observation-cap experiment lever (VERDICT r5 #6) — set
            # before ANY local BA compiles so the whole run (warmup
            # included) uses one D
            sysm.mapper.obs_cap = int(os.environ.get("BENCH_OBS_CAP", "8"))
    # force-compile the classic per-stage ladder (reloc/recovery path) so
    # a mid-run fallback frame costs milliseconds, not a compile
    sysm.use_fused = False
    for i in range(warmup - 3, warmup):
        sysm.track_rgbl(imgs[i], clouds[i], i * 0.1)
    sysm.use_fused = True
    # force-compile the local BA (its NATURAL first run — from the 3rd
    # keyframe — may land inside the timed region; triangulation and fuse
    # compile at the first warmup keyframe as single batched programs)
    sysm._join_mapping()
    if sysm.mapper is not None and sysm.map.n_kf >= 1:
        kfs = sysm.map.valid_kf_ids()
        sysm.mapper.local_bundle_adjustment(int(kfs[-1]))
    if cadence > 0 and sysm.tracker is not None:
        sysm.tracker.force_kf_every = cadence
        sysm.tracker.deferred_kf = 0
    if sysm.loop_closer is not None and os.environ.get("BENCH_GBA", "1") == "0":
        sysm.loop_closer.run_gba = False   # triage: correction without GBA
    if sysm.loop_closer is not None:
        # fix the loop-time solver shapes at generous tiers and compile
        # them now (the first event otherwise stalls ~80 s on tunnel
        # compiles mid-run; a deployment pays this once at startup)
        sysm.loop_closer.gba_tiers = (256, 8192)
        sysm.loop_closer.pg_tiers = (256, 1024)
        expect_kf = (n_frames - warmup) // max(cadence, 1) + 16
        sysm.loop_closer.prewarm(n_kf_hint=expect_kf, lm_hint=8192,
                                 pair_tiers=(256, 512, 1024))
    if sysm.mapper is not None:
        sysm.mapper.prewarm()     # local-BA landmark tiers
    log(f"warmup {warmup} frames: {time.perf_counter()-t0:.1f}s")

    # ---- timed engine loop ----------------------------------------------
    log(f"=== timed window starts {time.strftime('%H:%M:%S')} ===")
    n_kf_before = int(sysm.map.n_kf)
    t0 = time.perf_counter()
    per_frame = []
    kf_frames = []
    states = []
    for i in range(warmup, n_frames):
        ta = time.perf_counter()
        r = sysm.track_rgbl(imgs[i], clouds[i], i * 0.1)
        per_frame.append(time.perf_counter() - ta)
        states.append(r.state)
        if r.created_kf:
            kf_frames.append(i)
    sysm.shutdown()   # drain the async mapping plane + any running GBA
    wall = time.perf_counter() - t0
    worst = np.argsort(per_frame)[-5:]
    log("slowest frames: " + ", ".join(
        f"#{warmup + int(j)}={per_frame[int(j)]*1e3:.0f}ms"
        f"{'(KF)' if warmup + int(j) in kf_frames else ''}" for j in worst))
    n_timed = n_frames - warmup
    fps = n_timed / wall
    med_ms = float(np.median(per_frame) * 1e3)
    p95_ms = float(np.percentile(per_frame, 95) * 1e3)

    sp = os.environ.get("BENCH_SAVE")
    if sp:
        from orb_slam3_rgbl_tpu.utils import serialization

        serialization.save_map(sp, sysm.map)
        np.savez(sp + ".gt.npz", traj=traj,
                 kf_frames=np.asarray(kf_frames, np.int64))
        log(f"map saved to {sp}")
    est = sysm.trajectory()
    if sp:
        np.savez(sp + ".est.npz", est=est)
    gt = traj[: len(est)]
    err = float(ate_rmse(jnp.asarray(est[:, 4:7]),
                         jnp.asarray(gt[:, 4:7] - gt[0, 4:7])))

    ok_frac = float(np.mean([s == 2 for s in states]))
    # per-frame error profile (diagnose drift vs correction damage)
    per_err = np.linalg.norm(
        est[:, 4:7] - (gt[:, 4:7] - gt[0, 4:7]), axis=1)
    log(f"ok_frac {ok_frac:.3f}; err p50 {np.percentile(per_err,50):.2f} "
        f"p90 {np.percentile(per_err,90):.2f} max {per_err.max():.2f} "
        f"argmax {int(np.argmax(per_err))}")
    log("err trace (every 10th frame): "
        + " ".join(f"{x:.1f}" for x in per_err[::10]))
    if sysm.loop_closer is not None and sysm.loop_closer.events:
        m = sysm.map
        log("loop events (cur_frame<-matched_frame): " + ", ".join(
            f"{int(m.kf_frame_id[ev.kf_cur])}<-{int(m.kf_frame_id[ev.kf_matched])}"
            for ev in sysm.loop_closer.events))
    n_kf_timed = len(kf_frames)
    deferred = int(getattr(sysm.tracker, "deferred_kf", 0))
    n_loops = len(sysm.loop_closer.events) if sysm.loop_closer else 0
    log(timer.report())
    log(f"engine: {fps:.1f} FPS sustained ({med_ms:.1f} ms median, "
        f"{p95_ms:.0f} ms p95), {sysm.map.n_kf} KFs total "
        f"({n_kf_timed} in timed window = "
        f"{100.0 * n_kf_timed / n_timed:.1f}/100 frames, {deferred} deferred), "
        f"{int(sysm.map.lm_valid.sum())} landmarks, {n_loops} loop events, "
        f"ATE {err:.3f} m over {n_frames} frames")
    return {
        "engine_fps": round(fps, 2),
        "median_frame_ms": round(med_ms, 2),
        "p95_frame_ms": round(p95_ms, 1),
        "ate_m": round(err, 4),
        "n_kf": int(sysm.map.n_kf),
        "kf_per_100_frames": round(100.0 * n_kf_timed / n_timed, 1),
        "deferred_kf": deferred,
        "loop_events": n_loops,
        "ok_frac": round(ok_frac, 3),
        "n_landmarks": int(sysm.map.lm_valid.sum()),
        "vocab": os.environ.get("BENCH_VOCAB", "lsh"),
        "obs_cap": int(os.environ.get("BENCH_OBS_CAP", "8")),
    }



def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    cadence = int(os.environ.get("BENCH_KF_CADENCE", "4"))
    out = run_engine_bench(n_frames=n, cadence=cadence)
    print(json.dumps({
        "metric": "rgbl_engine_fps",
        "value": out["engine_fps"],
        "unit": "frames/s/chip",
        "vs_baseline": round(out["engine_fps"] / 10.0, 3),
        **{k: v for k, v in out.items() if k != "engine_fps"},
    }))


if __name__ == "__main__":
    main()
