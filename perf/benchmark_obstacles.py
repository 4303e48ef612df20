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
    # (`perf/benchmark_unicycle.cpp:32`).  The obstacle landscape needs the
    # reference-default 20-try line search (the parking config's 6-try cap
    # drops the fleet from ~90% to ~24% solved — measured config sweep,
    # perf/obstacle_f32_floor.out); initial penalty 1 with the deep search
    # is both the best-converging and fastest config of the sweep.  The f32
    # residue (~11% MAX_PENALTY, all of which solve in f64) is finished by
    # the f64 polish phase.
    params_b, Zb = bench.make_batch(prob, defn, batch, dtype)
    baseline = 1000.0 / 31.768  # the reference's wall time ON THIS SCENARIO

    # two modes: pure-f32 throughput, and "complete" — r5: the residue is
    # finished by the on-device fresh-restart PORTFOLIO (V penalty-ladder
    # variants side by side in one widened batch, still all-f32, one
    # dispatch) instead of the 30x-slower host-side f64 re-solve tail
    for mode, portfolio in (("f32_throughput", False), ("complete", True)):
        kw = {}
        if portfolio:
            # measured variant sweep (r5): same/x4/x1.5-gentle cascade is
            # the best completeness-per-wall point — 99.37% SOLVED at
            # 3,282 solves/s (4-variant adds +0.4% solved at -13% rate)
            kw = dict(
                restart_portfolio=(
                    dict(),
                    dict(penalty_scaling=4.0, max_iterations_outer=60,
                         max_iterations_total=900),
                    dict(penalty_scaling=1.5, max_iterations_outer=120,
                         max_iterations_total=1100),
                ),
                restart_width=1024,
                restart_rounds=1,
            )
        solver = bench.make_solver(
            prob, batch, initial_penalty=1.0,
            line_search_max_iterations=20, max_stall_iterations=10,
            outer_constraints_f64=True, **kw,
        )
        solver.f64_polish = False
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
        # canonical element obstacle clearance (>= -1 mm per the reference
        # test, `example_unicycle_test.cpp:76-83`)
        X0 = np.asarray(res["Z"].X[..., 0], np.float64)
        clearance = np.inf
        for cx, cy, r in zip(*defn.obstacles):
            d = np.sqrt((X0[:, 0] - cx) ** 2 + (X0[:, 1] - cy) ** 2) - r
            clearance = min(clearance, float(d.min()))
        print(json.dumps({
            "metric": "unicycle_three_obstacle_al_ilqr_solves_per_s_per_chip",
            "mode": mode,
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
            "f64_polish": solver.telemetry.get("polish"),
            "restart_portfolio": bool(portfolio),
            "device": str(jax.devices()[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
