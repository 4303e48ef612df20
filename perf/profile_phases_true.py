#!/usr/bin/env python
"""Amortized per-phase profile of the batched inner iteration (run on TPU).

Dispatch on the tunneled TPU backend costs ~1 ms and identical repeated
executions can be served from a relay-side cache, so single-op timings are
unreliable.  This harness times jitted loops of 30 chained iterations
(loop-carried data dependence, fresh random inputs per call) and reports the
marginal per-iteration cost of each phase: expand, +backward, +forward
(= full inner iteration).
"""
import dataclasses
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np

from altro_tpu import SolverOptions
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last

LOOPS = 30


def timed_calls(fn, inputs, n=3):
    out = fn(inputs[0])
    jax.block_until_ready(out)
    ts = []
    for Z in inputs[: n + 1]:
        t0 = time.perf_counter()
        out = fn(Z)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])  # drop first timed call (cache warm)


def main():
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    fwd_mode = os.environ.get("FWD", "pallas")
    bwd_mode = os.environ.get("BWD", "pallas")
    opts = SolverOptions(
        backward_pass=bwd_mode, forward_pass=fwd_mode, scan_unroll=4
    )
    s = ALSolverBatched(prob, opts)
    params = prob.params
    al = s.al_state_init(B, dtype)
    al_pad = None
    if s._fwd is not None:
        # build the padded AL state the way ilqr_solve does
        al_pad = s._fwd.pad_al(al)

    Z0 = defn.initial_trajectory()
    rng = np.random.default_rng(0)

    def fresh_Z():
        X = jnp.asarray(
            np.broadcast_to(np.asarray(Z0.X)[..., None], Z0.X.shape + (B,))
            + rng.normal(0, 1e-3, Z0.X.shape + (B,)),
            dtype,
        )
        U = jnp.asarray(
            np.broadcast_to(np.asarray(Z0.U)[..., None], Z0.U.shape + (B,))
            + rng.normal(0, 1e-3, Z0.U.shape + (B,)),
            dtype,
        )
        Zb = to_batch_last(
            jax.tree_util.tree_map(
                lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0
            )
        )
        return dataclasses.replace(Zb, X=X, U=U)

    inputs = [fresh_Z() for _ in range(5)]
    eps = jnp.asarray(1e-30, dtype)

    @jax.jit
    def loop_expand(Z):
        def body(i, Z):
            exp = s.expand(params, al, Z)
            dX = exp["lx"] + exp["lxx"][:, :, 0] + exp["lxu"][:, :, 0]
            dX = dX.at[:-1].add(exp["A"][:, :, 0])
            dU = exp["lu"] + exp["luu"][:, :, 0]
            dU = dU.at[:-1].add(exp["B"][:, 0])
            dJ = exp["costs"][..., None, :]
            return dataclasses.replace(
                Z, X=Z.X + eps * (dX + dJ), U=Z.U + eps * dU[:-1]
            )

        return jax.lax.fori_loop(0, LOOPS, body, Z)

    @jax.jit
    def loop_expand_backward(Z):
        def body(i, carry):
            Z, rho, drho = carry
            exp = s.expand(params, al, Z)
            bp = s.backward_pass(exp, rho, drho)
            dX = eps * (bp["K"][:, 0] + bp["d"][:, 0:1] * 0.0 + bp["d"][:, 0][:, None, :] * 0 + bp["K"][:, 0])
            Z2 = dataclasses.replace(Z, X=Z.X.at[:-1].add(dX))
            return (Z2, bp["rho"], bp["drho"])

        Zf, _, _ = jax.lax.fori_loop(
            0,
            LOOPS,
            body,
            (Z, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype)),
        )
        return Zf

    @jax.jit
    def loop_full_iteration(Z):
        def body(i, carry):
            Z, rho, drho = carry
            exp = s.expand(params, al, Z)
            J0 = exp["costs"].sum(axis=0)
            bp = s.backward_pass(exp, rho, drho)
            fp = s.forward_pass(params, al, Z, bp, J0, al_pad=al_pad)
            return (fp["Z"], fp["rho"], fp["drho"])

        Zf, _, _ = jax.lax.fori_loop(
            0,
            LOOPS,
            body,
            (Z, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype)),
        )
        return Zf

    if bwd_mode == "fused":
        # expansion + backward are one kernel; profile it as a single phase
        al_pad_bwd = s._bwd.pad_al(al)

        @jax.jit
        def loop_fused_backward(Z):
            def body(i, carry):
                Z, rho, drho = carry
                bp = s.backward_pass_fused(params, al_pad_bwd, Z, rho, drho)
                dX = eps * bp["K"][:, 0]
                Z2 = dataclasses.replace(Z, X=Z.X.at[:-1].add(dX))
                return (Z2, bp["rho"], bp["drho"])

            Zf, _, _ = jax.lax.fori_loop(
                0, LOOPS, body,
                (Z, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype)),
            )
            return Zf

        @jax.jit
        def loop_fused_full(Z):
            def body(i, carry):
                Z, rho, drho = carry
                bp = s.backward_pass_fused(params, al_pad_bwd, Z, rho, drho)
                fp = s.forward_pass(
                    params, al, Z, bp, bp["J0"], al_pad=al_pad
                )
                return (fp["Z"], fp["rho"], fp["drho"])

            Zf, _, _ = jax.lax.fori_loop(
                0, LOOPS, body,
                (Z, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype)),
            )
            return Zf

        t_eb = timed_calls(loop_fused_backward, inputs) / LOOPS
        t_full = timed_calls(loop_fused_full, inputs) / LOOPS
        print(f"B={B} fwd={fwd_mode} bwd={bwd_mode}  (per inner iteration, ms)")
        print(f"  expand+backward (fused kernel): {t_eb*1e3:8.3f}")
        print(f"  forward  (marginal):            {(t_full-t_eb)*1e3:8.3f}")
        print(f"  full iteration:                 {t_full*1e3:8.3f}")
        return

    t_e = timed_calls(loop_expand, inputs) / LOOPS
    t_eb = timed_calls(loop_expand_backward, inputs) / LOOPS
    t_full = timed_calls(loop_full_iteration, inputs) / LOOPS
    print(f"B={B} fwd={fwd_mode} bwd={bwd_mode}  (per inner iteration, ms)")
    print(f"  expand:              {t_e*1e3:8.3f}")
    print(f"  backward (marginal): {(t_eb-t_e)*1e3:8.3f}")
    print(f"  forward  (marginal): {(t_full-t_eb)*1e3:8.3f}")
    print(f"  full iteration:      {t_full*1e3:8.3f}")


if __name__ == "__main__":
    main()
