"""Compiled-on-TPU kernel and full-solve verification.

The CPU suite pins interpret mode (tests/test_pallas.py,
tests/test_forward_pallas.py); these tests assert the COMPILED Pallas
kernels — the execution path behind the headline benchmark — on the real
chip, plus one full `CompactedALSolver` solve at the exact shipped bench
config with control parity vs the f64 reference golden.

Auto-skipped off-TPU.  Run with:
    ALTRO_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q
(`bench.py` also runs the kernel checks inline before every measurement via
`perf.verify_kernels.verify_compiled_kernels`.)
"""
import os
import sys

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiled-TPU verification requires a TPU backend",
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def parking():
    import jax.numpy as jnp

    from altro_tpu.models.problems import UnicycleProblem

    defn = UnicycleProblem(dtype=jnp.float32)
    prob = defn.make_problem(add_constraints=True).compile()
    return defn, prob


def test_compiled_kernels_match_scan_oracles(parking):
    from perf.verify_kernels import verify_compiled_kernels

    defn, prob = parking
    deltas = verify_compiled_kernels(prob, defn, batch=1024)
    # sanity: the comparison actually exercised nontrivial data
    assert deltas["riccati_K_rel"] >= 0.0 and deltas["fwd_J"] >= 0.0


def test_full_solve_shipped_config_parity(parking):
    """One full compacted solve at the EXACT bench config: every status
    accounted for, canonical control parity within the measured f32
    envelope vs the f64 reference (the 1e-4 driver target is met exactly
    in f64 — tests/test_control_parity.py; see PARITY.md)."""
    import bench

    from altro_tpu import SolverStatus

    defn, prob = parking
    import jax.numpy as jnp

    batch = 1024
    solver = bench.make_solver(prob, batch)
    params_b, Zb = bench.make_batch(prob, defn, batch, jnp.float32)
    res = solver.solve(params_b, Zb)
    status = np.asarray(res["status"])
    hist = bench.status_histogram(status)
    assert sum(hist.values()) == batch, hist
    assert hist.get(SolverStatus.SOLVED.name, 0) >= int(0.99 * batch), hist

    U_ref, X_ref, J_ref = bench.load_reference_golden()
    U0 = np.asarray(res["Z"].U[..., 0], np.float64)
    control_parity = float(np.abs(U0 - U_ref).max())
    # measured on v5e: 4.7e-4 (perf/diagnose_parity.out); bound = 1.5x headroom
    assert control_parity <= 7e-4, control_parity


def test_parity_metric_at_reference_test_config(parking):
    """The driver metric (control parity ≤ 1e-4, BASELINE.md:28), measured
    the way `bench.py` reports it: shipped kernels, f32, the reference's
    test config (constraint_tolerance=1e-6, `auglag_test.cpp:337`) vs the
    f64 solve of the same config — the config whose J the reference pins
    to 1e-17 (`auglag_test.cpp:346-349`).  Measured on v5e: 8.8e-5."""
    import bench

    from altro_tpu import SolverStatus

    defn, prob = parking
    res, _ = bench.parity_solve(prob, defn, batch=1024)
    assert int(np.asarray(res["status"][0])) == int(SolverStatus.SOLVED)
    U_ref, X_ref, J_ref = bench.load_reference_golden(
        "unicycle_turn90_refsolve_f64_tol6.npz"
    )
    U0 = np.asarray(res["Z"].U[..., 0], np.float64)
    X0 = np.asarray(res["Z"].X[..., 0], np.float64)
    assert float(np.abs(U0 - U_ref).max()) <= 1e-4
    assert float(np.abs(X0 - X_ref).max()) <= 1e-4
    J0 = float(np.asarray(res["stats"].cost[0], np.float64))
    assert abs(J0 - J_ref) / J_ref <= 1e-4
