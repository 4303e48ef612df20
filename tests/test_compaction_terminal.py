"""Compaction behavior for terminally-failing instances and warm re-solves.

Round-2 gaps (VERDICT #10): no test covered an instance ending MAX_PENALTY
mid-tail (`compaction.py:_RESUMABLE` deliberately excludes terminal failure
codes), and the batched warm-start re-solve loop (the reference's MPC
workflow, `perf/benchmark_unicycle.cpp:45-75`) had no batched twin.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu import SolverOptions, SolverStatus
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last
from altro_tpu.solver.compaction import _RESUMABLE, CompactedALSolver


def _fleet_with_infeasible(B=8, bad_goal=(6.0, 6.0, 0.0)):
    """Parking fleet where instance 1's goal is unreachable: per-instance
    goal-constraint targets (trailing batch axis), one outside what the
    bounded controls (reach v_max*tf = 4.5) can hit in the horizon."""
    defn = UnicycleProblem()
    defn.N = 20
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    xf = np.tile(np.asarray(defn.xf)[:, None], (1, B))
    xf[:, 1] = bad_goal
    params = prob.params
    # goal constraint family: replace its xf with the batched targets;
    # the COST refs stay at the shared xf (only feasibility is broken)
    new_cons = []
    for fam, fp in zip(prob.constraint_families, params.constraints):
        if fam.label == "Goal Constraint":
            fp = {"xf": jnp.asarray(xf)}
        new_cons.append(fp)
    params = params.replace(constraints=tuple(new_cons))
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (B,) + leaf.shape), Z0
        )
    )
    return prob, params, Zb, defn


def test_max_penalty_instance_reported_not_resumed():
    """An instance that exhausts the penalty ladder mid-tail keeps its
    MAX_PENALTY status (terminal, `al_solver.hpp:388-393`), is excluded
    from further tail rounds, and the rest of the fleet still solves."""
    B = 8
    prob, params, Zb, _ = _fleet_with_infeasible(B)
    # Ceiling low enough that the penalty ladder tops out while the inner
    # solves still converge (at pen >= 100 the infeasible instance's inner
    # solve itself fails first, which is the other test's scenario).
    opts = SolverOptions(maximum_penalty=5.0)
    solver = CompactedALSolver(
        prob, opts, phase1_iters=6, tail_batch=4, max_tail_rounds=12
    )
    res = solver.solve(params, Zb)
    status = np.asarray(res["status"])
    assert int(status[1]) == int(SolverStatus.MAX_PENALTY), status
    others = np.delete(status, 1)
    assert np.all(others == int(SolverStatus.SOLVED)), status
    assert int(SolverStatus.MAX_PENALTY) not in [int(s) for s in _RESUMABLE]
    # terminal: compaction stopped because nothing resumable remained,
    # not because it exhausted max_tail_rounds
    assert len(solver.telemetry["tail_rounds"]) < solver.max_tail_rounds


def test_nonconverging_instance_does_not_livelock_tail():
    """A hopeless instance (inner solve itself cannot converge) burned
    max_iterations_inner in EVERY tail round before round 3's fix: after an
    uncapped tail round the budget statuses are terminal, so exactly one
    tail round runs (the reference aborts on a failed inner solve,
    `al_solver.hpp:378-381`)."""
    B = 8
    prob, params, Zb, _ = _fleet_with_infeasible(B, bad_goal=(40.0, 40.0, 0.0))
    solver = CompactedALSolver(
        prob, SolverOptions(), phase1_iters=6, tail_batch=4, max_tail_rounds=12
    )
    res = solver.solve(params, Zb)
    status = np.asarray(res["status"])
    assert int(status[1]) in (
        int(SolverStatus.MAX_INNER_ITERATIONS),
        int(SolverStatus.MAX_ITERATIONS),
        int(SolverStatus.MAX_PENALTY),
    ), status
    others = np.delete(status, 1)
    assert np.all(others == int(SolverStatus.SOLVED)), status
    assert len(solver.telemetry["tail_rounds"]) == 1, solver.telemetry


def test_batched_warm_start_mpc_resolve():
    """Batched analog of the reference's warm-started re-solve loop
    (`perf/benchmark_unicycle.cpp:45-75`): re-solving from the solution
    with carried duals/penalties converges immediately to the same answer."""
    B = 8
    defn = UnicycleProblem()
    defn.N = 30
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(3, B)))
    params = prob.params.replace(x0=x0s)
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (B,) + leaf.shape), Z0
        )
    )
    cold = ALSolverBatched(prob, SolverOptions())
    res1 = jax.jit(cold.solve)(params, Zb)
    assert np.all(np.asarray(res1["status"]) == int(SolverStatus.SOLVED))

    warm_opts = SolverOptions(reset_duals=False, initial_penalty=0.0)
    warm = ALSolverBatched(prob, warm_opts)
    res2 = jax.jit(warm.solve)(params, res1["Z"], res1["al"])
    assert np.all(np.asarray(res2["status"]) == int(SolverStatus.SOLVED))
    # warm start from the optimum: no more than a couple of polish iters
    cold_iters = np.asarray(res1["stats"].iterations_total)
    warm_iters = np.asarray(res2["stats"].iterations_total)
    assert warm_iters.max() <= 3, warm_iters
    assert warm_iters.max() < cold_iters.min()
    np.testing.assert_allclose(
        np.asarray(res2["Z"].U), np.asarray(res1["Z"].U), atol=2e-3
    )
