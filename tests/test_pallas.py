"""Pallas Riccati kernel equivalence vs the scan oracle (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu import SolverOptions
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.ops.riccati_pallas import TILE, riccati_pallas
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last


@pytest.fixture(scope="module")
def batched_exp():
    # f64: the kernel and the scan accumulate in different orders, so f32
    # comparison is noise-limited; f64 shows true algorithmic equivalence.
    B = TILE  # one (8,128) tile
    defn = UnicycleProblem(dtype=jnp.float64)
    defn.N = 12
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    fast = ALSolverBatched(prob, SolverOptions())
    Z0 = defn.initial_trajectory()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (3, B)))
    params = prob.params.replace(x0=x0s)
    Zb = to_batch_last(
        jax.tree_util.tree_map(lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0)
    )
    Zb = fast.rollout(params, Zb)
    al = fast.al_state_init(B, jnp.float64)
    exp = fast.expand(params, al, Zb)
    return fast, exp, B


def test_pallas_matches_scan(batched_exp):
    fast, exp, B = batched_exp
    rho = jnp.zeros((B,), jnp.float32)
    K0, d0, dV1_0, dV2_0, f0 = fast.riccati_scan(exp, rho)
    K1, d1, dV1_1, dV2_1, f1 = riccati_pallas(exp, rho, interpret=True)
    np.testing.assert_allclose(K1, K0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(d1, d0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dV1_1, dV1_0, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(dV2_1, dV2_0, rtol=1e-8, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))


def test_pallas_matches_scan_with_reg(batched_exp):
    fast, exp, B = batched_exp
    rho = jnp.full((B,), 0.37, exp["A"].dtype)
    K0, d0, *_ = fast.riccati_scan(exp, rho)
    K1, d1, *_ = riccati_pallas(exp, rho, interpret=True)
    np.testing.assert_allclose(K1, K0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(d1, d0, rtol=1e-9, atol=1e-9)


def test_pallas_detects_failure(batched_exp):
    fast, exp, B = batched_exp
    # poison luu at one knot to be negative definite -> every instance fails
    exp_bad = dict(exp)
    exp_bad["luu"] = exp["luu"].at[3].set(
        jnp.broadcast_to(
            jnp.diag(jnp.array([-1.0, -1.0], exp["luu"].dtype))[:, :, None],
            exp["luu"].shape[1:],
        )
    )
    rho = jnp.zeros((B,), exp["luu"].dtype)
    *_, f0 = fast.riccati_scan(exp_bad, rho)
    *_, f1 = riccati_pallas(exp_bad, rho, interpret=True)
    assert bool(jnp.all(f0))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))
