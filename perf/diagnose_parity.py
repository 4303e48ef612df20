#!/usr/bin/env python
"""Bisect the bench-config parity drift on the real TPU.

Round-2 finding (VERDICT.md weak #1): canonical cost rel err moved from
8.0e-5 (r1 config: pallas backward, scan forward, ls-cap 20) to 2.2e-4
(r2 config: + fused pallas forward, ls-cap 6) with no explanation.  This
script runs the bench workload (batch 4096 perturbed parking problems,
canonical element 0 = x0 origin) under each knob combination and reports,
per config: canonical cost, control parity vs the f64 reference golden
(`tests/goldens/unicycle_turn90_refsolve_f64.npz`, made by
make_canonical_golden.py), and the full status histogram.

Run on the TPU: `PYTHONPATH=/root/repo python perf/diagnose_parity.py`.
"""
import json
import os
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
    Z0 = defn.initial_trajectory()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, size=(3, batch)), dtype)
    x0s = x0s.at[:, 0].set(jnp.zeros(3, dtype))
    params_b = prob.params.replace(x0=x0s)
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape), Z0
        )
    )

    g = np.load(
        os.path.join(
            os.path.dirname(__file__), "..", "tests", "goldens",
            "unicycle_turn90_refsolve_f64.npz",
        )
    )
    U_ref, X_ref, J_ref = g["U"], g["X"], float(g["cost"])
    golden_tol6 = 0.03893465058924039  # auglag_test.cpp:346-349 (tol 1e-6)

    configs = {
        "shipped(pallas+pallas,ls6)": dict(
            backward_pass="pallas", forward_pass="pallas",
            scan_unroll=4, line_search_max_iterations=6,
        ),
        "ls20(pallas+pallas)": dict(
            backward_pass="pallas", forward_pass="pallas", scan_unroll=4,
        ),
        "fwd_scan(ls6)": dict(
            backward_pass="pallas", forward_pass="scan",
            scan_unroll=4, line_search_max_iterations=6,
        ),
        "r1(pallas+scan,ls20)": dict(
            backward_pass="pallas", forward_pass="scan", scan_unroll=4,
        ),
        "oracle(scan+scan,ls20)": dict(
            backward_pass="scan", forward_pass="scan", scan_unroll=4,
        ),
    }

    for name, kw in configs.items():
        solver = CompactedALSolver(
            prob, SolverOptions(**kw), phase1_iters=14,
            tail_batch=min(1024, batch),
        )
        t0 = time.perf_counter()
        res = solver.solve(params_b, Zb)
        jax.block_until_ready(res["Z"].U)
        wall = time.perf_counter() - t0
        status = np.asarray(res["status"])
        hist = {
            SolverStatus(code).name: int(np.sum(status == code))
            for code in sorted(set(int(s) for s in status))
        }
        U0 = np.asarray(res["Z"].U[..., 0], np.float64)
        X0 = np.asarray(res["Z"].X[..., 0], np.float64)
        cost0 = float(np.asarray(res["stats"].cost[0], np.float64))
        out = {
            "config": name,
            "wall_s": round(wall, 3),
            "canonical_cost": round(cost0, 9),
            "cost_err_vs_f64ref": round(cost0 - J_ref, 9),
            "cost_rel_err_vs_tol6_golden": round(
                abs(cost0 - golden_tol6) / golden_tol6, 6
            ),
            "control_parity": round(float(np.abs(U0 - U_ref).max()), 8),
            "state_parity": round(float(np.abs(X0 - X_ref).max()), 8),
            "status_hist": hist,
            "hist_total": int(sum(hist.values())),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
