"""Distributed-BA scaling curve over a virtual device mesh (VERDICT r5 #5).

Runs the landmark-sharded matrix-free PCG global BA
(``parallel/sharded_ba.make_distributed_pcg_ba`` — the ONLY production
multi-device path; the dense-Schur variant is a test oracle) on the SAME
problem over 1/2/4/8 virtual devices and records:

* steady-state wall time per mesh size (HONESTY NOTE below),
* the analytic communication budget per LM iteration — the quantity
  that actually governs ICI scaling on real hardware,
* per-shard landmark count (the parallel work share),
* final-cost agreement across mesh sizes (the psum structure is exact:
  sharding must not change the math).

HONESTY NOTE: with ``--xla_force_host_platform_device_count`` the
"devices" are host threads sharing this machine's physical cores (this
box has very few), so wall time validates the communication structure —
shardings compile, psums reduce, results agree — NOT real speedup; a
virtual mesh cannot beat the core count. On a real pod slice the same
program's collectives ride ICI at ~100 GB/s/link and the budget below
is what matters.

Communication budget per LM iteration (K poses, C cg iterations, f32):
  assembly:   psum g_p (K*6*4 B) + psum Hpp_diag (K*36*4 B) + cost (4 B)
  per CG it:  psum Hp (K*6*4 B) + 2 scalar psums (dot products)
  acceptance: psum cost_new + active count (8 B)
  total ≈ (K*6*4)*(C+1) + K*144 + 16 B  — independent of M.
At KITTI scale (K=1408, C=60): ≈ 2.3 MB per LM iteration — microseconds
on ICI; landmark math (O(M/N)) dominates until M/N approaches K.

Usage: python tools/bench_scaling.py [out.json]
"""

import json
import os
import subprocess
import sys

K, D, M = 768, 4, 262144   # M saturates 8 shards: M/8 = 32k >> K
ITERS, CG = 3, 40


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
from orb_slam3_rgbl_tpu.optim.local_ba import _linearize
from __graft_entry__ import _synth_gba_problem

cam = kitti_rgbl_config().camera
K, D, M = {K}, {D}, {M}
problem, poses_gt, _ = _synth_gba_problem(K, M, D, cam)
mesh = mesh_mod.make_mesh({n_dev})
run = sharded_ba.make_distributed_pcg_ba(mesh, cam, iterations={ITERS}, cg_iters={CG})
sp = sharded_ba.shard_problem(problem, mesh)
t0 = time.time()
out = run(sp)
jax.block_until_ready(out)
compile_and_first = time.time() - t0
t0 = time.time()
out = run(sp)
jax.block_until_ready(out)
steady = time.time() - t0
poses, lms = out
import jax.numpy as jnp
P2 = problem._replace(poses=jnp.asarray(poses), landmarks=jnp.asarray(lms))
*_, cost = _linearize(P2, cam, False, jnp.ones_like(problem.obs_mask))
print(json.dumps(dict(n_dev={n_dev}, steady_s=round(steady, 3),
                      first_s=round(compile_and_first, 3),
                      lm_per_shard=M // {n_dev},
                      final_cost=float(cost))))
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
    cost0 = rows[0]["final_cost"]
    ncpu = os.cpu_count()
    comm_per_iter_B = K * 6 * 4 * (CG + 1) + K * 144 + 16
    for r in rows:
        r["speedup_vs_1dev"] = round(base / r["steady_s"], 3)
        # sharding must not change the math: psum-reduced solve agrees
        r["cost_agrees"] = bool(
            abs(r["final_cost"] - cost0) <= 0.02 * abs(cost0) + 1e-6)
        r["physical_cores"] = ncpu
        r["comm_per_lm_iter_bytes"] = comm_per_iter_B
        r["note"] = ("virtual CPU mesh on %d cores: validates sharding/"
                     "comm structure + agreement, not real speedup" % ncpu)
        print(r)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
