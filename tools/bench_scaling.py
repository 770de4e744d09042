"""Distributed-BA scaling curve over a virtual device mesh.

Runs the landmark-sharded matrix-free PCG global BA
(``parallel/sharded_ba.make_distributed_pcg_ba``) on the SAME problem
over 1/2/4/8 virtual devices and records per-iteration wall time.

HONESTY NOTE: with ``--xla_force_host_platform_device_count`` the
"devices" are host threads sharing this machine's physical cores, so the
curve validates the communication structure (shardings compile, psum
amounts are right, results agree), NOT real speedup — virtual devices
cannot beat the core count. On a real pod slice the same program's
collectives ride ICI; per-device work is 1/N of the landmark math and
the psum payload is O(K·6) per CG iteration, independent of N.

Usage: python tools/bench_scaling.py [out.json]
"""

import json
import os
import subprocess
import sys


def run_one(n_dev: int) -> dict:
    """Each mesh size needs its own XLA_FLAGS → separate process."""
    code = f"""
import os, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={n_dev}"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.parallel import mesh as mesh_mod, sharded_ba
from __graft_entry__ import _synth_gba_problem

cam = kitti_rgbl_config().camera
K, D, M = 256, 4, 65536
problem, poses_gt, _ = _synth_gba_problem(K, M, D, cam)
mesh = mesh_mod.make_mesh({n_dev})
run = sharded_ba.make_distributed_pcg_ba(mesh, cam, iterations=4, cg_iters=60)
sp = sharded_ba.shard_problem(problem, mesh)
t0 = time.time()
out = run(sp)
jax.block_until_ready(out)
compile_and_first = time.time() - t0
t0 = time.time()
out = run(sp)
jax.block_until_ready(out)
steady = time.time() - t0
print(json.dumps(dict(n_dev={n_dev}, steady_s=round(steady, 3),
                      first_s=round(compile_and_first, 3))))
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    rows = [run_one(n) for n in (1, 2, 4, 8)]
    base = rows[0]["steady_s"]
    for r in rows:
        r["speedup_vs_1dev"] = round(base / r["steady_s"], 3)
        r["note"] = "virtual CPU mesh: validates sharding/comm structure, not real speedup"
        print(r)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
