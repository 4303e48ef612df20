#!/usr/bin/env python
"""Measure the effect of max_stall_iterations on straggler iteration counts.

perf/diagnose_stragglers.out: the 12 worst instances burn 40-50 NO-STEP
iterations (line search fails with grad just above tolerance; dual/penalty
escalation is what eventually unsticks them, not more failed line
searches).  Each stalled inner round costs `max_stall_iterations` lockstep
iterations before the outer loop gets to escalate.  Iteration counts are
deterministic, so this is immune to tunnel load noise.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python perf/experiment_stall_cap.py
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import bench
from altro_tpu import SolverStatus
from altro_tpu.models.problems import UnicycleProblem

GOLDEN = 0.03893465058924039


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    params_b, Zb = bench.make_batch(prob, defn, batch, dtype)

    for cap in (10, 6, 4, 3, 2):
        solver = bench.make_solver(prob, batch, max_stall_iterations=cap)
        res = solver.solve(params_b, Zb)
        jax.block_until_ready(res["Z"].U)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solver.solve(params_b, Zb)
            jax.block_until_ready(res["Z"].U)
            walls.append(time.perf_counter() - t0)
        iters = np.asarray(res["stats"].iterations_total)
        hist = bench.status_histogram(np.asarray(res["status"]))
        cost0 = float(np.asarray(res["stats"].cost[0], np.float64))
        print(json.dumps({
            "max_stall_iterations": cap,
            "iters_p50": float(np.percentile(iters, 50)),
            "iters_p99": float(np.percentile(iters, 99)),
            "iters_max": int(iters.max()),
            "iters_sum": int(iters.sum()),
            "status_hist": hist,
            "cost_rel_err": round(abs(cost0 - GOLDEN) / GOLDEN, 6),
            "wall_med_s": round(float(np.median(walls)), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
