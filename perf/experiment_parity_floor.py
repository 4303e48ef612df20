#!/usr/bin/env python
"""Measure the f32 parity floor on the canonical element (run on TPU).

How close can the f32 batch-native solver get to the f64 reference answer
(tests/goldens/unicycle_turn90_refsolve_f64_tol6.npz — reproduces the
reference's pinned J=0.03893465058924039 and 14/5 iterations,
`auglag_test.cpp:325-351`) when allowed to converge deeply?  Isolates the
f32 precision envelope from the stopping-tolerance ball: the residual at
the floor is what f32 arithmetic costs, everything above it is tolerance.
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

from altro_tpu import SolverOptions, SolverStatus
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last

GOLDEN = os.path.join(_REPO, "tests", "goldens", "unicycle_turn90_refsolve_f64_tol6.npz")


def main() -> None:
    batch = 1024  # min width keeping the Pallas kernels eligible
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (batch,) + l.shape), Z0
        )
    )
    params_b = prob.params.replace(x0=jnp.zeros((3, batch), dtype))
    g = np.load(GOLDEN)
    U_ref, X_ref, J_ref = g["U"], g["X"], float(g["cost"])

    base = dict(backward_pass="fused", forward_pass="pallas", scan_unroll=4)
    configs = [
        ("ref-test(ctol1e-6)", dict(constraint_tolerance=1e-6)),
        ("deep(ctol1e-6,jtol1e-7,gtol1e-4)",
         dict(constraint_tolerance=1e-6, cost_tolerance=1e-7,
              gradient_tolerance=1e-4, max_iterations_total=400,
              max_iterations_inner=200)),
        ("floor(ctol1e-6,jtol1e-9,gtol1e-5)",
         dict(constraint_tolerance=1e-6, cost_tolerance=1e-9,
              gradient_tolerance=1e-5, max_iterations_total=600,
              max_iterations_inner=300)),
        ("floor-scan-kernels",
         dict(backward_pass="scan", forward_pass="scan",
              constraint_tolerance=1e-6, cost_tolerance=1e-9,
              gradient_tolerance=1e-5, max_iterations_total=600,
              max_iterations_inner=300)),
    ]
    for label, kw in configs:
        opts = SolverOptions(**{**base, **kw})
        fb = ALSolverBatched(prob, opts)
        solve = jax.jit(fb.solve)
        res = solve(params_b, Zb)
        jax.block_until_ready(res["Z"].U)
        U0 = np.asarray(res["Z"].U[..., 0], np.float64)
        X0 = np.asarray(res["Z"].X[..., 0], np.float64)
        st = int(np.asarray(res["status"][0]))
        print(json.dumps({
            "config": label,
            "status0": SolverStatus(st).name,
            "iters0": int(np.asarray(res["stats"].iterations_total[0])),
            "control_parity": round(float(np.abs(U0 - U_ref).max()), 8),
            "state_parity": round(float(np.abs(X0 - X_ref).max()), 8),
            "cost_err": round(float(np.asarray(res["stats"].cost[0], np.float64)) - J_ref, 10),
            "grad0": float(np.asarray(res["stats"].gradient[0])),
        }), flush=True)


if __name__ == "__main__":
    main()
