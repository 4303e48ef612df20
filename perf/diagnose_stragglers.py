#!/usr/bin/env python
"""Diagnose the straggler instances that dominate the compacted tail phase.

BENCH_r03: iters_p99 = 16 but iters_max = 70 — a handful of instances run
~55 extra lockstep iterations at 1024-lane width, and the tail phase costs
as much wall time as all of phase 1 (perf/sweep_tuning.out).  This dumps
the per-iteration history (cost, alpha, z, gradient, regularization,
violation, penalty) of the worst instances to see WHY they take 4-6x the
p99 iteration count.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python perf/diagnose_stragglers.py
"""
import json
import os
import sys

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
from altro_tpu.solver.batched import batched_stats_column


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    params_b, Zb = bench.make_batch(prob, defn, batch, dtype)

    solver = bench.make_solver(prob, batch, iteration_history_capacity=96)
    res = solver.solve(params_b, Zb)
    jax.block_until_ready(res["Z"].U)

    iters = np.asarray(res["stats"].iterations_total)
    status = np.asarray(res["status"])
    order = np.argsort(-iters)
    x0 = np.asarray(params_b.x0)

    cols = {
        name: np.asarray(batched_stats_column(res["stats"], name))
        for name in ("cost", "alpha", "improvement_ratio", "gradient",
                     "regularization", "violations", "max_penalty")
    }
    print(json.dumps({
        "iters_p50": float(np.percentile(iters, 50)),
        "iters_p99": float(np.percentile(iters, 99)),
        "iters_max": int(iters.max()),
        "n_over_p99x2": int((iters > 2 * np.percentile(iters, 99)).sum()),
    }))
    for idx in order[:4]:
        n = int(iters[idx])
        rows = []
        for it in range(min(n, cols["cost"].shape[0])):
            rows.append({
                "it": it,
                "J": float(cols["cost"][it, idx]),
                "a": round(float(cols["alpha"][it, idx]), 5),
                "z": round(float(cols["improvement_ratio"][it, idx]), 4),
                "g": float(cols["gradient"][it, idx]),
                "rho": float(cols["regularization"][it, idx]),
                "viol": float(cols["violations"][it, idx]),
                "pen": float(cols["max_penalty"][it, idx]),
            })
        print(json.dumps({
            "instance": int(idx),
            "x0": [round(float(v), 6) for v in x0[:, idx]],
            "status": SolverStatus(int(status[idx])).name,
            "iters": n,
            "history": rows,
        }), flush=True)


if __name__ == "__main__":
    main()
