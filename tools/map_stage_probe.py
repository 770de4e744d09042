"""Isolated mapping-plane stage timing (round-5 FPS forensics).

The engine bench's per-stage medians are inflated by device-queue
interleave (every stage's download waits behind the other planes'
queued programs). This probe loads a saved bench map (``BENCH_SAVE``),
rebuilds the mapping plane, and times triangulation / fusion / local BA
on an IDLE queue — the true device+round-trip cost of each program,
i.e. the floor the scheduler is working against.

Run: python tools/map_stage_probe.py /tmp/r5map.npz [n_reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5map.npz"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax

    from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
    from orb_slam3_rgbl_tpu.slam.local_mapping import LocalMapper
    from orb_slam3_rgbl_tpu.utils import serialization
    from orb_slam3_rgbl_tpu.utils.profiling import StageTimer

    cfg = kitti_rgbl_config()
    m = serialization.load_map(path)
    mapper = LocalMapper(cfg, m)
    timer = StageTimer()
    mapper.timer = timer
    kfs = m.valid_kf_ids()
    print(f"map: {len(kfs)} KFs, {int(m.lm_valid.sum())} landmarks, "
          f"device {jax.devices()[0]}", file=sys.stderr)

    # warm every program once (compiles excluded from timing)
    tail = [int(k) for k in kfs[-reps - 1:]]
    mapper.process_keyframe(tail[0])

    for kf in tail[1:]:
        t0 = time.perf_counter()
        mapper._triangulate_new_points(kf)
        t1 = time.perf_counter()
        mapper._search_in_neighbors(kf)
        t2 = time.perf_counter()
        mapper.local_bundle_adjustment(kf)
        t3 = time.perf_counter()
        timer.record("idle_tri", t1 - t0)
        timer.record("idle_fuse", t2 - t1)
        timer.record("idle_lba", t3 - t2)
    print(timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
