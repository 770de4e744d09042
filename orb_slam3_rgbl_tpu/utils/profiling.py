"""Stage-level timing instrumentation.

Mirrors the reference's ``REGISTER_TIMES`` machinery (``Tracking.h:182-196``,
``Tracking::PrintTimeStats`` ``Tracking.cc:263-528``): every pipeline stage
records wall-clock samples under the same taxonomy so numbers are
comparable side-by-side; ``report()`` prints mean/std/median per stage.

Device work is asynchronous — stages that end on device values call
``block_until_ready`` before stopping the clock iff ``sync=True``
(default off so steady-state pipelining is measured, on for stage
attribution). For kernel-level views use ``jax.profiler.trace`` around a
run and inspect with xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np

# Reference stage taxonomy (Tracking::PrintTimeStats)
STAGES = (
    "rect", "resize", "orb_extract", "depth_module", "stereo_match",
    "imu_integration", "pose_pred", "lm_track", "new_kf",
    "kf_insert", "mp_cull", "mp_create", "lba", "kf_cull",
    "pr", "sim3", "loop_fusion", "opt_essential", "gba",
)


class StageTimer:
    def __init__(self, sync: bool = False):
        self.samples: Dict[str, List[float]] = defaultdict(list)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and result is not None:
                import jax

                jax.block_until_ready(result)
            self.samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def stats(self) -> Dict[str, dict]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs) * 1e3
            out[name] = {
                "n": len(xs),
                "mean_ms": float(a.mean()),
                "std_ms": float(a.std()),
                "median_ms": float(np.median(a)),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<16}{'n':>6}{'mean ms':>10}{'std':>8}{'median':>9}"]
        for name, s in sorted(self.stats().items()):
            lines.append(
                f"{name:<16}{s['n']:>6}{s['mean_ms']:>10.2f}{s['std_ms']:>8.2f}{s['median_ms']:>9.2f}"
            )
        return "\n".join(lines)


GLOBAL_TIMER = StageTimer()


def save_stats(timer: StageTimer, path: str):
    """Dump per-stage statistics to a text file — the analog of the
    reference's ``f_track_stats`` / ``ExecMean.txt`` outputs
    (``Tracking.h:347-353``, written by ``PrintTimeStats``)."""
    with open(path, "w") as f:
        f.write(timer.report() + "\n")
    return path
