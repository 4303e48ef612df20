#!/usr/bin/env python
"""Generate the f64 reference solution golden for the canonical bench element.

The driver's parity metric is "control trajectories matching altro-cpp to
1e-4" (BASELINE.md:28).  The per-instance f64 solver at default options IS
the altro-cpp-equivalent program: its full-solve trajectory/cost/iteration
behavior is pinned against the reference's Altro.jl-derived goldens in
tests/test_al.py (J to 1e-9, 14/5 iterations, `auglag_test.cpp:325-351`).
This script runs that solve for the canonical bench element (unicycle
turn-90 parking, N=100, goal + control bounds, x0 = 0, default tolerances)
and saves X/U/J to `tests/goldens/unicycle_turn90_refsolve_f64.npz`;
`bench.py` compares the f32 batched canonical solution against it and
reports `control_parity` = max|U_f32_batched − U_f64_ref|.

Run on CPU with x64: `python perf/make_canonical_golden.py`.
"""
import os
import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from altro_tpu import ALSolver, SolverOptions, SolverStatus
    from altro_tpu.models.problems import UnicycleProblem

    defn = UnicycleProblem(dtype=jnp.float64)
    prob = defn.make_problem(add_constraints=True).compile()
    solver = ALSolver(prob, SolverOptions())  # reference-default options
    res = jax.jit(solver.solve)(prob.params, defn.initial_trajectory())
    status = int(res.status)
    assert status == int(SolverStatus.SOLVED), status
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens",
        "unicycle_turn90_refsolve_f64.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        X=np.asarray(res.Z.X, np.float64),
        U=np.asarray(res.Z.U, np.float64),
        cost=np.asarray(res.stats.cost, np.float64),
        violations=np.asarray(res.stats.violations, np.float64),
        iterations_total=np.asarray(res.stats.iterations_total),
        iterations_outer=np.asarray(res.stats.iterations_outer),
    )
    print(
        f"wrote {out}: J={float(res.stats.cost):.12f} "
        f"viol={float(res.stats.violations):.3e} "
        f"iters={int(res.stats.iterations_total)}"
        f"/{int(res.stats.iterations_outer)} outer"
    )


if __name__ == "__main__":
    sys.exit(main())
