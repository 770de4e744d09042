"""Benchmark: per-chip frames/s of the fused RGB-L frame step.

Measures the complete per-frame hot path of SURVEY.md §3.2 as a single
jitted XLA program on KITTI-regime inputs (1241×376 gray, ~131k LiDAR
points, 2000 ORB features, 8 pyramid levels, InverseDilation Diamond-5):
ORB pyramid extraction + FAST + rBRIEF, LiDAR projection + upsampling,
MXU descriptor association, and the 4-round robust pose solve.

Baseline: KITTI plays at 10 Hz; the reference runs "real-time on an i7"
(BASELINE.md), so ``vs_baseline`` = fps / 10 (1.0 = real-time parity,
≥2.0 = the BASELINE.json throughput target).

Prints exactly ONE JSON line on stdout.
"""

import json
import sys
import time

import jax


def main():
    from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
    from orb_slam3_rgbl_tpu.slam.compiled import make_frame_step, example_inputs

    cfg = kitti_rgbl_config()
    fn = jax.jit(make_frame_step(cfg))
    args = example_inputs(cfg, n_points=131072)

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"compile: {compile_s:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    # warmup steady-state
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(f"frame step: {dt*1e3:.2f} ms -> {fps:.1f} FPS", file=sys.stderr)
    print(json.dumps({
        "metric": "rgbl_frame_step_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
