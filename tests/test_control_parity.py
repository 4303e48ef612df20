"""Control-sequence parity vs the reference, and the f32 precision envelope.

The driver metric is "control trajectories matching altro-cpp to 1e-4"
(BASELINE.md:28).  Decomposition established in round 3 (see PARITY.md):

  * ALGORITHM parity is exact: in f64 the batch-native solver follows the
    reference's iteration path bit-for-bit decision-wise and reproduces the
    f64 reference-default solution (the golden from
    perf/make_canonical_golden.py, itself pinned to altro-cpp's Altro.jl
    goldens in tests/test_al.py) to ~5e-14 in U.
  * The f32 deviation is PRECISION, not algorithm: f32 rounding shifts the
    inner-exit tests (dJ reaches the f32 cost-resolution floor ~1e-7 near
    the optimum), which changes the outer-iteration count (3-4 vs 2), and
    the diameter of the 1e-4-tolerance stopping ball in U is ~4e-4 for this
    problem (R = 1e-2·h = 3e-4 makes U flat against cost).  Every stopping
    point inside the ball is an equally valid answer at the reference's own
    tolerances; altro-cpp's own U moves ~4e-4 between tol 1e-4 and 1e-6.

These tests pin both halves: exactness in f64 (where the metric is
well-posed) and the measured envelope in f32 (so precision regressions are
caught).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu import ALSolver, SolverOptions, SolverStatus
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last


@pytest.fixture(scope="module")
def golden():
    import os

    g = np.load(
        os.path.join(
            os.path.dirname(__file__), "goldens",
            "unicycle_turn90_refsolve_f64.npz",
        )
    )
    return g


def _solve_batched(dtype, opts, B=4):
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0
        )
    )
    fb = ALSolverBatched(prob, opts)
    return jax.jit(fb.solve)(
        prob.params.replace(x0=jnp.zeros((3, B), dtype)), Zb
    )


def test_golden_regenerates(golden):
    """The committed golden is the f64 reference-default solve (the program
    pinned to altro-cpp's goldens in test_al.py)."""
    defn = UnicycleProblem(dtype=jnp.float64)
    prob = defn.make_problem(add_constraints=True).compile()
    solver = ALSolver(prob, SolverOptions())
    res = jax.jit(solver.solve)(prob.params, defn.initial_trajectory())
    assert int(res.status) == int(SolverStatus.SOLVED)
    np.testing.assert_allclose(res.Z.U, golden["U"], rtol=0, atol=1e-12)
    assert int(res.stats.iterations_total) == int(golden["iterations_total"])
    assert int(res.stats.iterations_outer) == int(golden["iterations_outer"])


def test_f64_batched_control_parity_exact(golden):
    """f64 batch-native solver == f64 reference solve to ~1e-12 in U: the
    driver's control-parity metric, met exactly in the precision regime
    where it is well-posed (measured 5e-14)."""
    res = _solve_batched(jnp.float64, SolverOptions())
    U0 = np.asarray(res["Z"].U[..., 0])
    np.testing.assert_allclose(U0, golden["U"], rtol=0, atol=1e-10)
    assert int(res["status"][0]) == int(SolverStatus.SOLVED)
    assert int(res["stats"].iterations_total[0]) == int(
        golden["iterations_total"]
    )


def test_f64_batched_shipped_knobs_parity_exact(golden):
    """The bench's tuned scan knobs (ls-cap 6, unroll 4) do not change the
    f64 answer: same path, same U to 1e-10."""
    res = _solve_batched(
        jnp.float64,
        SolverOptions(scan_unroll=4, line_search_max_iterations=6),
    )
    U0 = np.asarray(res["Z"].U[..., 0])
    np.testing.assert_allclose(U0, golden["U"], rtol=0, atol=1e-10)
    assert int(res["stats"].iterations_total[0]) == int(
        golden["iterations_total"]
    )


def test_f32_precision_envelope(golden):
    """The f32 solve lands inside the documented precision envelope: SOLVED,
    within 5e-4 of the f64 answer in U, cost within 1e-3 relative.  (The
    measured r3 value is ~4e-4 on CPU; a regression past this bound means
    an actual precision bug, not tolerance-ball wander.)"""
    res = _solve_batched(jnp.float32, SolverOptions())
    assert int(res["status"][0]) == int(SolverStatus.SOLVED)
    U0 = np.asarray(res["Z"].U[..., 0], np.float64)
    assert float(np.abs(U0 - golden["U"]).max()) <= 5e-4
    cost0 = float(np.asarray(res["stats"].cost[0], np.float64))
    assert abs(cost0 - float(golden["cost"])) <= 1e-3 * float(golden["cost"])
