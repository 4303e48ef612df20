#!/usr/bin/env python
"""Batched three-obstacle unicycle throughput (BASELINE config 3).

This is the EXACT scenario behind the reference's 31.768 ms wall-time
anchor (`/root/reference/perf/profiler_unicycle.out:3`,
`perf/benchmark_unicycle.cpp:18-43` — kThreeObstacles, N=100, control
bounds + goal + 3 circle constraints, initial penalty 10): the one
apples-to-apples throughput comparison available, unlike the parking
scenario the driver metric names.  Solves a perturbed fleet with the
shipped bench kernels and reports solves/s and the canonical element's
obstacle clearance (the reference's own quality check,
`example_unicycle_test.cpp:76-83`: clearance >= -1 mm at every knot).

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python perf/benchmark_obstacles.py
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


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(scenario="three_obstacles", dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    # the reference benchmark sets penalty 10 for this scenario
    # (`perf/benchmark_unicycle.cpp:32`)
    solver = bench.make_solver(prob, batch, initial_penalty=10.0)
    params_b, Zb = bench.make_batch(prob, defn, batch, dtype)

    res = solver.solve(params_b, Zb)
    jax.block_until_ready(res["Z"].U)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = solver.solve(params_b, Zb)
        jax.block_until_ready(res["Z"].U)
        walls.append(time.perf_counter() - t0)
    dt = float(np.median(walls))

    hist = bench.status_histogram(np.asarray(res["status"]))
    iters = np.asarray(res["stats"].iterations_total)
    # canonical element obstacle clearance (>= -1 mm per the reference test)
    X0 = np.asarray(res["Z"].X[..., 0], np.float64)
    clearance = np.inf
    for cx, cy, r in zip(*defn.obstacles):
        d = np.sqrt((X0[:, 0] - cx) ** 2 + (X0[:, 1] - cy) ** 2) - r
        clearance = min(clearance, float(d.min()))
    baseline = 1000.0 / 31.768  # the reference's wall time ON THIS SCENARIO
    print(json.dumps({
        "metric": "unicycle_three_obstacle_al_ilqr_solves_per_s_per_chip",
        "value": round(batch / dt, 2),
        "unit": "solves/s",
        "vs_baseline_same_scenario": round(batch / dt / baseline, 2),
        "batch": batch,
        "status_hist": hist,
        "wall_s_per_batch": round(dt, 4),
        "wall_s_reps": [round(t, 4) for t in walls],
        "iters_p50": float(np.percentile(iters, 50)),
        "iters_p99": float(np.percentile(iters, 99)),
        "iters_max": int(iters.max()),
        "canonical_min_clearance_m": round(clearance, 5),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
