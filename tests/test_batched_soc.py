"""Second-order cones in the batch-native solver.

Round-2 gap (VERDICT #4): `ALSolverBatched` rejected SOC constraints, so
conic problems were confined to the slower vmap path.  These tests pin the
batch-last Lorentz-cone algebra against the per-instance cone functions and
the full batched conic solve against the vmap-of-general-solver oracle —
the reference handles every cone uniformly in one solver loop
(`altro/constraints/constraint.hpp:28-122`, `problem.cpp:43-57`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu import ALSolver, Cone, Constraint, SolverOptions, SolverStatus
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.problem.constraints import cone_jacobian, cone_project
from altro_tpu.solver.batched import (
    ALSolverBatched,
    from_batch_last,
    soc_jacobian_bl,
    soc_project_bl,
    to_batch_last,
)


def _random_rows(nk=5, p=4, B=16, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.normal(size=(nk, p, B))
    # ensure all three regions occur: inside, polar, boundary
    s[0, -1, :] = np.abs(s[0, :-1, :]).sum(axis=0) + 1.0  # inside
    s[1, -1, :] = -(np.abs(s[1, :-1, :]).sum(axis=0) + 1.0)  # polar
    return jnp.asarray(s)


def test_soc_project_bl_matches_per_instance():
    s = _random_rows()
    out = soc_project_bl(s)
    for k in range(s.shape[0]):
        for b in range(s.shape[2]):
            ref = cone_project(Cone.SECOND_ORDER, s[k, :, b])
            np.testing.assert_allclose(out[k, :, b], ref, atol=1e-12)


def test_soc_jacobian_bl_matches_per_instance():
    s = _random_rows(seed=1)
    J = soc_jacobian_bl(s)
    for k in range(s.shape[0]):
        for b in range(0, s.shape[2], 3):
            ref = cone_jacobian(Cone.SECOND_ORDER, s[k, :, b])
            np.testing.assert_allclose(J[k, :, :, b], ref, atol=1e-12)


def _soc_problem(N=40):
    """Unicycle parking with a velocity SOC |v| <= vmax (the conic problem
    from tests/test_cones.py::test_conic_al_solve, shortened horizon)."""
    defn = UnicycleProblem()
    defn.N = N
    defn.__post_init__()
    builder = defn.make_problem(add_constraints=False)

    def soc_fn(params, x, u):
        del x
        return jnp.stack([u[0], params["vmax"]])

    soc = Constraint(
        params={"vmax": jnp.asarray(0.8)},
        fn=soc_fn,
        cone=Cone.SECOND_ORDER,
        dim=2,
        label="Velocity SOC",
    )
    builder.set_constraint(soc, range(N))
    return defn, builder.compile()


def test_batched_soc_solve_matches_vmap():
    """Full batched conic AL solve == vmap of the general solver,
    element-by-element (status, iterations, controls)."""
    B = 4
    defn, prob = _soc_problem()
    opts = SolverOptions()
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 3)))
    Z0 = defn.initial_trajectory()
    Zb = jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf, (B,) + leaf.shape), Z0
    )

    ref = ALSolver(prob, opts)
    from altro_tpu import ProblemParams

    axes = ProblemParams(x0=0, dynamics=None, costs=None, constraints=None)
    res_ref = jax.vmap(ref.solve, in_axes=(axes, 0, None))(
        prob.params.replace(x0=x0s), Zb, None
    )

    fast = ALSolverBatched(prob, opts)
    res_b = fast.solve(
        prob.params.replace(x0=jnp.moveaxis(x0s, 0, -1)), to_batch_last(Zb)
    )
    Zf = from_batch_last(res_b["Z"])

    np.testing.assert_array_equal(
        np.asarray(res_b["status"]), np.asarray(res_ref.status)
    )
    np.testing.assert_array_equal(
        np.asarray(res_b["stats"].iterations_total),
        np.asarray(res_ref.stats.iterations_total),
    )
    np.testing.assert_allclose(Zf.U, res_ref.Z.U, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(res_b["stats"].violations),
        np.asarray(res_ref.stats.violations),
        rtol=1e-8,
        atol=1e-12,
    )
    assert np.all(np.asarray(res_b["status"]) == int(SolverStatus.SOLVED))
    # the SOC actually binds
    U = np.asarray(Zf.U)
    assert np.abs(U[:, :, 0]).max() <= 0.8 + 1e-3


def test_batched_soc_cost_terms_match_general():
    """AL cost with warm SOC duals: batched `total_cost` == per-instance
    `ProblemFunctions.total_cost`."""
    defn, prob = _soc_problem(N=12)
    opts = SolverOptions()
    fast = ALSolverBatched(prob, opts)
    solver = ALSolver(prob, opts)
    B = 8
    rng = np.random.default_rng(9)
    Z0 = defn.initial_trajectory()
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (B,) + leaf.shape), Z0
        )
    )
    # warm duals in all three SOC regions
    al_b = tuple(
        dict(
            lam=jnp.asarray(rng.normal(size=st["lam"].shape)),
            rho=jnp.asarray(rng.uniform(1.0, 10.0, st["rho"].shape)),
        )
        for st in fast.al_state_init(B, jnp.float64)
    )
    Jb = fast.total_cost(prob.params, al_b, Zb)
    for b in range(B):
        al_i = tuple(
            type(s)(lam=st["lam"][..., b], rho=st["rho"][..., b])
            for s, st in zip(solver.init_al_state(jnp.float64), al_b)
        )
        J_i = solver.fns.total_cost(prob.params, al_i, Z0)
        np.testing.assert_allclose(Jb[b], J_i, rtol=1e-10)
