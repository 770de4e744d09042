"""Benchmark: per-chip frames/s of the RGB-L ENGINE (primary metric)
plus the fused frame-step kernel (secondary).

The primary number is the sustained throughput of the REAL
``System.track_rgbl`` loop — mapping, duplicate fusion, local BA and loop
closing all ON — measured by ``bench_engine.run_engine_bench`` on
device-rendered KITTI-regime synthetic frames (VERDICT r2: the headline
must be the engine, not a kernel).

Secondary: the single-dispatch frame-step kernel (extraction + depth +
matching + pose solve) in isolation — the per-frame device-time floor.

Measures the complete per-frame hot path of SURVEY.md §3.2 as a single
jitted XLA program on KITTI-regime inputs (1241×376 gray, ~131k LiDAR
points, 2000 ORB features, 8 pyramid levels, InverseDilation Diamond-5):
ORB pyramid extraction (fused Pallas FAST+blur streaming kernel, Pallas
one-hot-MXU BRIEF — no gathers), LiDAR projection + upsampling, MXU
descriptor association, and the 4-round robust pose solve.

Methodology notes (this measurement environment tunnels to the TPU and
``block_until_ready`` does not synchronize): all inputs are pre-staged on
device before timing; successive steps chain the pose state (true frame
dependency) and cycle pre-staged images; the clock stops only after a
scalar *download* of the final pose, which drains the execution queue.
Host↔device transfer of camera/LiDAR input is excluded (deployment
streams sensor data; the tunnel's ~14 MB/s is an artifact of this
harness, not the hardware).

Baseline: KITTI plays at 10 Hz; the reference runs "real-time on an i7"
(BASELINE.md), so ``vs_baseline`` = fps / 10 (1.0 = real-time parity,
≥ 2.0 = the BASELINE.json throughput target).

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def kernel_fps():
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
    from orb_slam3_rgbl_tpu.slam.compiled import make_frame_step, example_inputs

    cfg = kitti_rgbl_config()
    fn = jax.jit(make_frame_step(cfg))
    img, pts, prev_desc, prev_valid, prev_Xw, Tcw0 = example_inputs(cfg, n_points=131072)

    # pre-stage N_VAR distinct frames on device (outside the timed region)
    N_VAR = 4
    imgs = [
        jax.device_put(np.asarray(jax.random.uniform(jax.random.PRNGKey(100 + i), img.shape) * 255.0, np.float32))
        for i in range(N_VAR)
    ]
    t0 = time.perf_counter()
    out = fn(imgs[0], pts, prev_desc, prev_valid, prev_Xw, Tcw0)
    _ = np.asarray(out[0])  # drain: compile + first run complete
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    # warmup + drain
    Tcw = Tcw0
    for i in range(3):
        Tcw, n_inl, feats = fn(imgs[i % N_VAR], pts, prev_desc, prev_valid, prev_Xw, Tcw)
    _ = np.asarray(Tcw)

    iters = 20
    Tcw = Tcw0
    t0 = time.perf_counter()
    for i in range(iters):
        # chained pose (the real sequential dependency of tracking)
        Tcw, n_inl, feats = fn(imgs[i % N_VAR], pts, prev_desc, prev_valid, prev_Xw, Tcw)
    _ = np.asarray(Tcw)  # scalar download drains the queue
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(f"frame step: {dt*1e3:.2f} ms -> {fps:.1f} FPS", file=sys.stderr)
    return round(fps, 2)


def _engine_bench_subprocess(n: int, timeout_s: int):
    """Run the engine bench in a subprocess with a watchdog: the
    measurement tunnel's remote-compile relay occasionally wedges, and a
    wedged in-process device call can never be interrupted. On timeout
    the kernel metric still gets reported."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-u", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "bench_engine.py"), str(n)],
            capture_output=True, text=True, timeout=timeout_s,
        )
        sys.stderr.write(out.stderr[-4000:])
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
                if d.get("metric") == "rgbl_engine_fps":
                    return d
            except json.JSONDecodeError:
                continue
    except subprocess.TimeoutExpired:
        print("engine bench timed out (tunnel wedge?) — falling back to "
              "the kernel metric", file=sys.stderr)
    return None


def main():
    n = int(os.environ.get("BENCH_ENGINE_FRAMES", "300"))
    wd = int(os.environ.get("BENCH_ENGINE_TIMEOUT_S", "1500"))
    eng = _engine_bench_subprocess(n, wd)
    kfps = kernel_fps()
    if eng is not None:
        print(json.dumps({
            "metric": "rgbl_engine_fps",
            "value": eng["value"],
            "unit": "frames/s/chip",
            "vs_baseline": round(eng["value"] / 10.0, 3),
            "median_frame_ms": eng.get("median_frame_ms"),
            "ate_m": eng.get("ate_m"),
            "kernel_frame_step_fps": kfps,
        }))
    else:
        print(json.dumps({
            "metric": "rgbl_frame_step_fps",
            "value": kfps,
            "unit": "frames/s/chip",
            "vs_baseline": round(kfps / 10.0, 3),
            "note": "engine bench unavailable this run (tunnel wedge); kernel metric only",
        }))


if __name__ == "__main__":
    main()
