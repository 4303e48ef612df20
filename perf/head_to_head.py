#!/usr/bin/env python
"""Head-to-head of the top bench-config candidates with enough repetitions
to beat the chip's run-to-run variance (sweep_tuning points scatter up to
1.6x on single 3-rep timings; this uses 10 reps and reports the median).

Run on the TPU: PYTHONPATH=/root/repo:$PYTHONPATH python perf/head_to_head.py
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

REPS = 10


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    params_b, Zb = bench.make_batch(prob, defn, batch, dtype)

    candidates = [
        ("shipped(p14,ls6,S1)", dict()),
        ("p20,ls10", dict(line_search_max_iterations=10), dict(phase1_iters=20)),
        ("p14,ls6,S6", dict(line_search_parallel=6)),
        ("p14,ls6,S3", dict(line_search_parallel=3)),
        ("ip10,p14,ls6", dict(initial_penalty=10.0)),
        ("ip10,p20,ls10,S6", dict(initial_penalty=10.0, line_search_max_iterations=10,
                                  line_search_parallel=6), dict(phase1_iters=20)),
    ]
    # Interleave repetitions across configs so slow drift in ambient
    # host/tunnel load biases every config equally (measured: back-to-back
    # per-config blocks showed a monotonic decline that reversed ranking).
    from altro_tpu.solver.compaction import CompactedALSolver

    solvers, times, last_res = [], [], []
    for cand in candidates:
        label, overrides = cand[0], cand[1]
        solver_kw = cand[2] if len(cand) > 2 else {}
        opts = bench.bench_options().replace(**overrides)
        solver = CompactedALSolver(
            prob, opts,
            phase1_iters=solver_kw.get("phase1_iters", bench.PHASE1_ITERS),
            tail_batch=min(bench.TAIL_BATCH, batch),
        )
        res = solver.solve(params_b, Zb)  # warm-up/compile
        jax.block_until_ready(res["Z"].U)
        solvers.append(solver)
        times.append([])
        last_res.append(res)
    for _ in range(REPS):
        for i, solver in enumerate(solvers):
            t0 = time.perf_counter()
            res = solver.solve(params_b, Zb)
            jax.block_until_ready(res["Z"].U)
            times[i].append(time.perf_counter() - t0)
            last_res[i] = res
    for i, cand in enumerate(candidates):
        ts = np.array(times[i])
        res = last_res[i]
        solved = int(jnp.sum(res["status"] == SolverStatus.SOLVED))
        stalled = int(jnp.sum(res["status"] == SolverStatus.SOLVED_STALLED))
        print(json.dumps({
            "config": cand[0],
            "solves_per_s_median": round(batch / float(np.median(ts)), 1),
            "solves_per_s_best": round(batch / float(ts.min()), 1),
            "wall_med_s": round(float(np.median(ts)), 4),
            "wall_iqr_s": round(float(np.percentile(ts, 75) - np.percentile(ts, 25)), 4),
            "solved": solved,
            "stalled": stalled,
            "unsolved": batch - solved - stalled,
        }), flush=True)


if __name__ == "__main__":
    main()
