#!/usr/bin/env python
"""Experiment: control parity at the reference test config (constraint tol 1e-6).

The reference pins its unicycle turn-90 golden with constraint_tolerance=1e-6
(`auglag_test.cpp:337`); BENCH_r03 shows the default-tolerance endpoints
disagree at 4.5e-4 in U (inside the 1e-4-violation ball).  This measures:
  1. f64 golden at constraint_tolerance=1e-6 (CPU, x64) — the altro-cpp answer
  2. f32 batched shipped-kernel solve at the same tolerance (TPU)
  3. max|U_f32 - U_f64| and the throughput cost of the tighter tolerance

Run: JAX_PLATFORMS=cpu stage writes the golden; TPU stage measures.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
GOLDEN_TIGHT = os.path.join(_REPO, "tests", "goldens", "unicycle_turn90_refsolve_f64_tol6.npz")


def make_golden():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from altro_tpu import ALSolver, SolverOptions, SolverStatus
    from altro_tpu.models.problems import UnicycleProblem

    defn = UnicycleProblem(dtype=jnp.float64)
    prob = defn.make_problem(add_constraints=True).compile()
    solver = ALSolver(prob, SolverOptions(constraint_tolerance=1e-6))
    res = jax.jit(solver.solve)(prob.params, defn.initial_trajectory())
    assert int(res.status) == int(SolverStatus.SOLVED), int(res.status)
    np.savez(
        GOLDEN_TIGHT,
        X=np.asarray(res.Z.X, np.float64),
        U=np.asarray(res.Z.U, np.float64),
        cost=np.asarray(res.stats.cost, np.float64),
        violations=np.asarray(res.stats.violations, np.float64),
        iterations_total=np.asarray(res.stats.iterations_total),
        iterations_outer=np.asarray(res.stats.iterations_outer),
    )
    print(
        f"golden: J={float(res.stats.cost):.12f} viol={float(res.stats.violations):.3e}"
        f" iters={int(res.stats.iterations_total)}/{int(res.stats.iterations_outer)}"
    )


def measure():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, _REPO)
    import bench
    from altro_tpu import SolverStatus
    from altro_tpu.models.problems import UnicycleProblem

    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    params_b, Zb = bench.make_batch(prob, defn, batch, dtype)
    g = np.load(GOLDEN_TIGHT)
    U_ref, X_ref = g["U"], g["X"]
    J_ref = float(g["cost"])

    for label, overrides in [
        ("tight(ctol=1e-6)", dict(constraint_tolerance=1e-6)),
        ("tight+ls20", dict(constraint_tolerance=1e-6, line_search_max_iterations=20)),
        ("shipped(ctol=1e-4)", dict()),
    ]:
        solver = bench.make_solver(prob, batch, **overrides)
        res = solver.solve(params_b, Zb)
        jax.block_until_ready(res["Z"].U)
        t0 = time.perf_counter()
        for _ in range(3):
            res = solver.solve(params_b, Zb)
        jax.block_until_ready(res["Z"].U)
        dt = (time.perf_counter() - t0) / 3
        U0 = np.asarray(res["Z"].U[..., 0], np.float64)
        hist = bench.status_histogram(np.asarray(res["status"]))
        print(json.dumps({
            "config": label,
            "solves_per_s": round(batch / dt, 1),
            "control_parity_tol6": round(float(np.abs(U0 - U_ref).max()), 8),
            "state_parity_tol6": round(float(np.abs(np.asarray(res["Z"].X[..., 0], np.float64) - X_ref).max()), 8),
            "cost_err_vs_tol6": round(float(np.asarray(res["stats"].cost[0], np.float64)) - J_ref, 9),
            "status_hist": hist,
        }), flush=True)


if __name__ == "__main__":
    if sys.argv[1:] == ["golden"]:
        make_golden()
    else:
        if not os.path.exists(GOLDEN_TIGHT):
            subprocess.run(
                [sys.executable, __file__, "golden"],
                check=True,
                env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": _REPO},
            )
        measure()
