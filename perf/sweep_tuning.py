#!/usr/bin/env python
"""Sweep solver-tuning knobs for the flagship bench (run on TPU).

Knobs swept: initial_penalty (reference knob, `solver_options.hpp:46`),
phase1_iters / tail_batch (compaction), scan_unroll.  Reports solves/s,
solved counts, canonical-cost parity vs the reference golden, and the
iteration distribution for each point.
"""
import itertools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from altro_tpu import SolverOptions, SolverStatus
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.solver.batched import to_batch_last
from altro_tpu.solver.compaction import CompactedALSolver

GOLDEN = 0.03893465058924039


def run_point(prob, Z0, batch, dtype, *, initial_penalty, phase1_iters,
              tail_batch, ls_cap=20, backward="fused", ls_parallel=1):
    opts = SolverOptions(
        backward_pass=backward,
        forward_pass="pallas",
        scan_unroll=4,
        initial_penalty=initial_penalty,
        line_search_max_iterations=ls_cap,
        line_search_parallel=ls_parallel,
    )
    solver = CompactedALSolver(
        prob, opts, phase1_iters=phase1_iters, tail_batch=min(tail_batch, batch)
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, size=(3, batch)), dtype)
    x0s = x0s.at[:, 0].set(jnp.zeros(3, dtype))
    params_b = prob.params.replace(x0=x0s)
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape), Z0
        )
    )
    res = solver.solve(params_b, Zb)
    jax.block_until_ready(res["Z"].U)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        res = solver.solve(params_b, Zb)
    jax.block_until_ready(res["Z"].U)
    dt_s = (time.perf_counter() - t0) / iters
    solved = int(jnp.sum(res["status"] == SolverStatus.SOLVED))
    stalled = int(jnp.sum(res["status"] == SolverStatus.SOLVED_STALLED))
    cost0 = float(np.asarray(res["stats"].cost[0], np.float64))
    return {
        "initial_penalty": initial_penalty,
        "phase1_iters": phase1_iters,
        "tail_batch": tail_batch,
        "ls_cap": ls_cap,
        "ls_parallel": ls_parallel,
        "backward": backward,
        "solves_per_s": round(batch / dt_s, 1),
        "solved": solved,
        "stalled": stalled,
        "unsolved": batch - solved - stalled,
        "cost_rel_err": round(abs(cost0 - GOLDEN) / GOLDEN, 6),
        "iters_p50": solver.telemetry.get("iters_p50"),
        "iters_p99": solver.telemetry.get("iters_p99"),
        "iters_max": solver.telemetry.get("iters_max"),
        "phase1_s": round(solver.telemetry.get("phase1_s", 0.0), 4),
        "tail_rounds": solver.telemetry.get("tail_rounds"),
    }


def main():
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    Z0 = defn.initial_trajectory()

    points = []
    # r3 re-tune under the fused backward kernel: phase1 cap x ls cap,
    # plus the r2 initial-penalty sanity points
    for p1, ls in itertools.product([12, 14, 16, 20], [6, 10, 20]):
        points.append(
            dict(initial_penalty=1.0, phase1_iters=p1, tail_batch=1024, ls_cap=ls)
        )
    for pen in (10.0, 100.0):
        points.append(
            dict(initial_penalty=pen, phase1_iters=14, tail_batch=1024, ls_cap=6)
        )
    # speculative line search (alpha_full_rate ~0.54 in BENCH_r03: the
    # lockstep sequential search averages ~2 widened-kernel-equivalent
    # rounds, so evaluating S candidates per round may win)
    for S, ls in ((2, 6), (3, 6), (4, 8), (6, 6)):
        points.append(
            dict(initial_penalty=1.0, phase1_iters=14, tail_batch=1024,
                 ls_cap=ls, ls_parallel=S)
        )

    for pt in points:
        try:
            out = run_point(prob, Z0, batch, dtype, **pt)
        except Exception as e:  # keep sweeping
            out = {**pt, "error": repr(e)[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
