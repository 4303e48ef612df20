"""Straggler compaction: `CompactedALSolver` must solve every instance to
the same tolerances as the plain lockstep batched solve, while only the
compact tail batch pays for the slow instances.

The reference has no batching, so the behavioral contract here is solution
quality, not iterate-path identity: phase boundaries legitimately restart the
inner solver (open-loop re-rollout + fresh regularization), which the
reference also does between warm-started re-solves
(`altro/augmented_lagrangian/al_solver.hpp:288-302`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu import SolverOptions, SolverStatus
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last
from altro_tpu.solver.compaction import CompactedALSolver


def _fleet(B, seed=0, spread=0.4):
    defn = UnicycleProblem()
    defn.N = 30
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(rng.uniform(-spread, spread, size=(3, B)))
    x0s = x0s.at[:, 0].set(jnp.zeros(3, x0s.dtype))
    params_b = prob.params.replace(x0=x0s)
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (B,) + leaf.shape), Z0
        )
    )
    return prob, params_b, Zb


def test_compacted_solves_whole_fleet():
    B = 32
    prob, params_b, Zb = _fleet(B)
    opts = SolverOptions()

    direct = ALSolverBatched(prob, opts)
    res_d = jax.jit(direct.solve)(params_b, Zb)
    assert np.all(np.asarray(res_d["status"]) == SolverStatus.SOLVED)

    comp = CompactedALSolver(
        prob, opts, phase1_iters=8, tail_batch=8, max_tail_rounds=10
    )
    res_c = comp.solve(params_b, Zb)

    # every instance converged, feasible to tolerance
    assert np.all(np.asarray(res_c["status"]) == SolverStatus.SOLVED)
    assert np.asarray(res_c["stats"].violations).max() < opts.constraint_tolerance

    # solutions agree with the uncompacted lockstep solve to solver tolerance
    U_d = np.asarray(res_d["Z"].U)
    U_c = np.asarray(res_c["Z"].U)
    np.testing.assert_allclose(U_c, U_d, atol=5e-3)
    # costs agree at solver-tolerance scale (each path stops when the
    # per-iteration decrease falls below cost_tolerance, not at a shared
    # optimum to machine precision)
    np.testing.assert_allclose(
        np.asarray(res_c["stats"].cost),
        np.asarray(res_d["stats"].cost),
        rtol=5e-3,
        atol=1e-8,
    )


def test_compacted_fast_path_identical_when_no_stragglers():
    """With a phase-1 budget above every instance's need, compaction is the
    plain batched solve bit-for-bit (no tail round runs)."""
    B = 8
    prob, params_b, Zb = _fleet(B, spread=0.05)
    opts = SolverOptions()
    direct = ALSolverBatched(prob, opts)
    res_d = jax.jit(direct.solve)(params_b, Zb)
    comp = CompactedALSolver(prob, opts, phase1_iters=300, tail_batch=4)
    res_c = comp.solve(params_b, Zb)
    np.testing.assert_array_equal(
        np.asarray(res_c["status"]), np.asarray(res_d["status"])
    )
    np.testing.assert_array_equal(
        np.asarray(res_c["Z"].U), np.asarray(res_d["Z"].U)
    )


def test_compacted_tail_wider_than_tail_batch():
    """More stragglers than one tail chunk: chunked gather/scatter covers all."""
    B = 24
    prob, params_b, Zb = _fleet(B, seed=3, spread=0.5)
    opts = SolverOptions()
    comp = CompactedALSolver(
        prob, opts, phase1_iters=4, tail_batch=4, max_tail_rounds=12
    )
    res_c = comp.solve(params_b, Zb)
    assert np.all(np.asarray(res_c["status"]) == SolverStatus.SOLVED)
    assert np.asarray(res_c["stats"].violations).max() < opts.constraint_tolerance


def test_compacted_padding_does_not_multicount_stats():
    """A short straggler chunk is padded by repeating its first index; the
    merge must not multi-count that instance's iteration counters (VERDICT r1
    weak #3).  Per-instance masking makes counters independent of chunking,
    so two tail widths — one that pads, one that never does — must agree
    exactly."""
    B = 32
    prob, params_b, Zb = _fleet(B, seed=1, spread=0.45)
    opts = SolverOptions()

    # tail_batch=1 never pads (every chunk is exactly one straggler)
    comp_nopad = CompactedALSolver(
        prob, opts, phase1_iters=8, tail_batch=1, max_tail_rounds=10
    )
    res_n = comp_nopad.solve(params_b, Zb)

    # tail_batch=32 pads unless exactly 32 stragglers remain
    comp_pad = CompactedALSolver(
        prob, opts, phase1_iters=8, tail_batch=32, max_tail_rounds=10
    )
    res_p = comp_pad.solve(params_b, Zb)

    np.testing.assert_array_equal(
        np.asarray(res_p["stats"].iterations_total),
        np.asarray(res_n["stats"].iterations_total),
    )
    np.testing.assert_array_equal(
        np.asarray(res_p["stats"].iterations_outer),
        np.asarray(res_n["stats"].iterations_outer),
    )
    np.testing.assert_array_equal(
        np.asarray(res_p["status"]), np.asarray(res_n["status"])
    )
    # gross multi-counting would blow past the iteration cap
    assert np.asarray(res_p["stats"].iterations_total).max() <= opts.max_iterations_total


def test_device_tail_bitwise_equals_host_tail():
    """The single-dispatch device-side compaction (r5: argsort-gather tail
    under jit, `CompactedALSolver(device_tail=True)`) reproduces the
    host-orchestrated phases BITWISE — statuses, endpoints, iteration
    counters, and the spliced per-iteration history rows."""
    B = 96
    prob, params_b, Zb = _fleet(B, seed=1, spread=0.3)
    opts = SolverOptions(
        backward_pass="scan", forward_pass="scan",
        iteration_history_capacity=64,
    )
    # tail_batch=16 forces multiple chunks (96 stragglers -> 6 rounds)
    host = CompactedALSolver(prob, opts, phase1_iters=5, tail_batch=16)
    dev = CompactedALSolver(
        prob, opts, phase1_iters=5, tail_batch=16, device_tail=True
    )
    rh = host.solve(params_b, Zb)
    rd = dev.solve(params_b, Zb)
    np.testing.assert_array_equal(
        np.asarray(rh["status"]), np.asarray(rd["status"])
    )
    np.testing.assert_allclose(
        np.asarray(rh["Z"].U), np.asarray(rd["Z"].U), rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(rh["stats"].iterations_total),
        np.asarray(rd["stats"].iterations_total),
    )
    np.testing.assert_allclose(
        np.asarray(rh["stats"].rows), np.asarray(rd["stats"].rows),
        rtol=0, atol=0,
    )
    # device telemetry still reports the iteration distribution
    assert dev.telemetry["iters_max"] >= 1


def test_device_tail_rejects_capped_tail_rounds():
    prob, params_b, Zb = _fleet(8)
    comp = CompactedALSolver(
        prob, SolverOptions(), tail_iters=5, device_tail=True
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        comp.solve(params_b, Zb)


def test_lane_opts_match_scalar_options():
    """Per-lane option overrides (`lane_opts`, r5) reproduce scalar-option
    solves lane by lane: a batch whose lanes carry penalty_scaling 10/4
    must equal the corresponding uniform-option solves bitwise."""
    B = 16
    prob, params_b, Zb = _fleet(B, seed=3, spread=0.35)
    base = SolverOptions(
        backward_pass="scan", forward_pass="scan", initial_penalty=1.0,
        line_search_max_iterations=20, max_stall_iterations=10,
    )
    s10 = ALSolverBatched(prob, base)
    s4 = ALSolverBatched(prob, base.replace(penalty_scaling=4.0))
    r10 = jax.jit(s10.solve)(params_b, Zb)
    r4 = jax.jit(s4.solve)(params_b, Zb)
    ps = jnp.asarray([10.0] * (B // 2) + [4.0] * (B // 2), Zb.X.dtype)
    lane_opts = dict(penalty_scaling=ps)
    rl = jax.jit(lambda p, Z: s10.solve(p, Z, lane_opts=lane_opts))(
        params_b, Zb
    )
    half = B // 2
    np.testing.assert_array_equal(
        np.asarray(rl["status"][:half]), np.asarray(r10["status"][:half])
    )
    np.testing.assert_array_equal(
        np.asarray(rl["status"][half:]), np.asarray(r4["status"][half:])
    )
    np.testing.assert_allclose(
        np.asarray(rl["Z"].U[..., :half]),
        np.asarray(r10["Z"].U[..., :half]), rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(rl["Z"].U[..., half:]),
        np.asarray(r4["Z"].U[..., half:]), rtol=0, atol=0,
    )


def test_restart_cascade_converts_residue():
    """The fresh-restart cascade (device path) converts instances the
    plain phases leave unSOLVED, without touching already-solved lanes."""
    B = 64
    import altro_tpu.models.problems as mp

    defn = mp.UnicycleProblem(scenario="three_obstacles", dtype=jnp.float32)
    defn.N = 30
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    rng = np.random.default_rng(0)
    params_b = prob.params.replace(
        x0=jnp.asarray(rng.uniform(-0.1, 0.1, (3, B)), jnp.float32)
    )
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0
        )
    )
    opts = SolverOptions(
        backward_pass="scan", forward_pass="scan", initial_penalty=1.0,
        line_search_max_iterations=20, max_stall_iterations=10,
        outer_constraints_f64=True,
    )
    plain = CompactedALSolver(
        prob, opts, phase1_iters=10, tail_batch=32, device_tail=True
    )
    casc = CompactedALSolver(
        prob, opts, phase1_iters=10, tail_batch=32, device_tail=True,
        restart_portfolio=(
            dict(),
            dict(penalty_scaling=4.0, max_iterations_outer=60,
                 max_iterations_total=900),
            dict(penalty_scaling=1.5, max_iterations_outer=120,
                 max_iterations_total=1100),
        ),
        restart_width=32,
    )
    rp = plain.solve(params_b, Zb)
    rc = casc.solve(params_b, Zb)
    sp = np.asarray(rp["status"])
    sc = np.asarray(rc["status"])
    solved = int(SolverStatus.SOLVED)
    assert (sc == solved).sum() > (sp == solved).sum()
    # lanes the plain phases solved keep their exact results
    keep = sp == solved
    np.testing.assert_array_equal(sc[keep], sp[keep])
    np.testing.assert_allclose(
        np.asarray(rc["Z"].U[..., keep]),
        np.asarray(rp["Z"].U[..., keep]), rtol=0, atol=0,
    )
