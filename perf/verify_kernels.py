"""On-device (compiled) Pallas-vs-scan kernel equivalence assertions.

The CPU test suite verifies both Pallas kernels in interpret mode
(tests/test_pallas.py, tests/test_forward_pallas.py); this module asserts
the COMPILED kernels — the code path behind the headline benchmark number —
against the XLA scan oracles on the live device.  It runs in two places:

  * `bench.py` calls `verify_compiled_kernels` before every measurement, so
    no bench number is ever recorded from unverified kernels (the reference
    analog: its tests always execute the real path,
    `test/ilqr/ilqr_test.cpp:196-204`).
  * `tests/test_tpu_compiled.py` wraps the same checks as a pytest module
    that auto-skips off-TPU.

Tolerances: on TPU everything is f32, and the kernel and scan accumulate in
different orders, so equality is to f32 round-off of a 100-step recursion
(the algorithmic, f64 equivalence is pinned in interpret mode on CPU).
Observed compiled-vs-scan deltas on v5e (N=100 parking problem, B=1024,
warm random AL state): K 4.5e-5 rel, d 2.4e-5 rel, dV1 9e-7 rel — the carry
noise saturates after a few backward steps and stays uniform along the
horizon.  Bounds below are ~5-10x above observed.
"""
from __future__ import annotations

import numpy as np


def verify_compiled_kernels(prob, defn, batch: int = 1024) -> dict:
    """Assert compiled Pallas forward+backward kernels match the scans.

    Returns a dict of observed max deltas (for logging).  Raises
    AssertionError on mismatch.
    """
    import jax
    import jax.numpy as jnp

    from altro_tpu import SolverOptions
    from altro_tpu.ops.riccati_pallas import riccati_pallas
    from altro_tpu.solver.batched import ALSolverBatched, to_batch_last

    dtype = jnp.float32
    opts_scan = SolverOptions(forward_pass="scan", backward_pass="scan")
    opts_pall = SolverOptions(forward_pass="pallas", backward_pass="pallas")
    ref = ALSolverBatched(prob, opts_scan)
    fast = ALSolverBatched(prob, opts_pall)

    Z0 = defn.initial_trajectory()
    rng = np.random.default_rng(42)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, size=(prob.n, batch)), dtype)
    params = prob.params.replace(x0=x0s)
    Zb = to_batch_last(
        jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (batch,) + l.shape), Z0
        )
    )
    Zb = jax.jit(ref.rollout)(params, Zb)
    # Warm AL state so the constraint terms are nontrivial.
    al = tuple(
        dict(
            lam=jnp.asarray(
                rng.uniform(-0.5, 0.0, st["lam"].shape), dtype
            ),
            rho=jnp.asarray(rng.uniform(1.0, 10.0, st["rho"].shape), dtype),
        )
        for st in ref.al_state_init(batch, dtype)
    )
    exp = jax.jit(ref.expand)(params, al, Zb)
    rho = jnp.zeros((batch,), dtype)

    deltas = {}

    # ---- backward: compiled riccati_pallas vs riccati_scan
    K0, d0, dV1_0, dV2_0, f0 = jax.jit(ref.riccati_scan)(exp, rho)
    K1, d1, dV1_1, dV2_1, f1 = jax.jit(
        lambda e, r: riccati_pallas(e, r, interpret=fast._interpret)
    )(exp, rho)
    scale_K = float(jnp.abs(K0).max())
    scale_d = float(jnp.abs(d0).max())
    deltas["riccati_K_rel"] = float(jnp.abs(K1 - K0).max()) / max(scale_K, 1.0)
    deltas["riccati_d_rel"] = float(jnp.abs(d1 - d0).max()) / max(scale_d, 1.0)
    deltas["riccati_dV1_rel"] = float(jnp.abs(dV1_1 - dV1_0).max()) / max(
        float(jnp.abs(dV1_0).max()), 1.0
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))
    assert deltas["riccati_K_rel"] <= 3e-4, deltas
    assert deltas["riccati_d_rel"] <= 3e-4, deltas
    assert deltas["riccati_dV1_rel"] <= 1e-5, deltas

    # ---- fused expansion+backward: compiled kernel vs expand + scan
    from altro_tpu.ops.backward_fused_pallas import build_backward_fused_kernel

    bwd = build_backward_fused_kernel(
        prob, opts_pall, interpret=fast._interpret
    )
    if bwd is not None:
        Kf, df, dV1f, dV2f, ff, J0f = jax.jit(
            lambda p, a, Z, r: bwd(p, a, Z, r)
        )(params, bwd.pad_al(al), Zb, rho)
        J0_ref = jax.jit(ref.total_cost)(params, al, Zb)
        deltas["fused_K_rel"] = float(jnp.abs(Kf - K0).max()) / max(scale_K, 1.0)
        deltas["fused_d_rel"] = float(jnp.abs(df - d0).max()) / max(scale_d, 1.0)
        deltas["fused_J0_rel"] = float(
            (jnp.abs(J0f - J0_ref) / jnp.abs(J0_ref)).max()
        )
        np.testing.assert_array_equal(np.asarray(ff), np.asarray(f0))
        assert deltas["fused_K_rel"] <= 3e-4, deltas
        assert deltas["fused_d_rel"] <= 3e-4, deltas
        assert deltas["fused_J0_rel"] <= 1e-5, deltas

    # ---- forward: compiled fused kernel vs rollout+cost scan pair
    alpha = jnp.asarray(
        rng.choice([1.0, 0.5, 0.25], size=(batch,)).astype(np.float32)
    )
    al_pad = fast._fwd.pad_al(al)
    Xn1, U1, J1, valid1, status1 = jax.jit(
        lambda p, a, Z, K, d, al_: fast._fwd(
            p, a, Z, K, d, al_, check_bounds=True
        )
    )(params, al_pad, Zb, K0, d0, alpha)
    Zbar0, valid0, status0 = jax.jit(ref.closed_loop_rollout)(
        params, Zb, K0, d0, alpha
    )
    J0 = jax.jit(ref.total_cost)(params, al, Zbar0)
    deltas["fwd_X"] = float(jnp.abs(Xn1 - Zbar0.X[1:]).max())
    deltas["fwd_U"] = float(jnp.abs(U1 - Zbar0.U).max())
    deltas["fwd_J"] = float(jnp.abs(J1 - J0).max() / jnp.abs(J0).max())
    np.testing.assert_array_equal(np.asarray(valid1), np.asarray(valid0))
    np.testing.assert_array_equal(np.asarray(status1), np.asarray(status0))
    assert deltas["fwd_X"] <= 1e-4, deltas
    assert deltas["fwd_U"] <= 1e-4, deltas
    assert deltas["fwd_J"] <= 1e-4, deltas
    return deltas
