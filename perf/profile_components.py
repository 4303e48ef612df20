#!/usr/bin/env python
"""Per-phase timing of the batched solve on the real chip.

Breaks the inner-iteration cost into expand / backward / forward(scan) /
forward(pallas) / rollout at the bench batch size, and times phase1 vs tail
of the compacted solve.  Run on TPU (no args).
"""
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
from altro_tpu.solver.compaction import CompactedALSolver


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()
    opts = SolverOptions(backward_pass="pallas", forward_pass="pallas", scan_unroll=4)
    s = ALSolverBatched(prob, opts)
    print("fwd kernel built:", s._fwd is not None, "T =", getattr(s._fwd, "T", None))

    Z0 = defn.initial_trajectory()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, size=(3, B)), dtype)
    params = prob.params.replace(x0=x0s)
    Zb = to_batch_last(
        jax.tree_util.tree_map(lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0)
    )
    print("use_fwd:", s._use_fwd(params, Zb))
    al = s.al_state_init(B, dtype)
    Zr = jax.jit(s.rollout)(params, Zb)

    t_roll, _ = timeit(jax.jit(s.rollout), params, Zb)
    print(f"open rollout (scan):      {t_roll*1e3:8.3f} ms")

    t_cost, _ = timeit(jax.jit(s.total_cost), params, al, Zr)
    print(f"total_cost (scan):        {t_cost*1e3:8.3f} ms")

    exp = jax.jit(s.expand)(params, al, Zr)
    t_exp, _ = timeit(jax.jit(s.expand), params, al, Zr)
    print(f"expand:                   {t_exp*1e3:8.3f} ms")

    rho = jnp.zeros((B,), dtype)
    drho = jnp.zeros((B,), dtype)
    t_bp, bp = timeit(jax.jit(s.backward_pass), exp, rho, drho)
    print(f"backward (pallas+retry):  {t_bp*1e3:8.3f} ms")

    t_sw, _ = timeit(jax.jit(s.riccati_scan), exp, rho)
    print(f"riccati scan sweep:       {t_sw*1e3:8.3f} ms")
    from altro_tpu.ops.riccati_pallas import riccati_pallas
    t_pw, _ = timeit(jax.jit(riccati_pallas), exp, rho)
    print(f"riccati pallas sweep:     {t_pw*1e3:8.3f} ms")

    K, d = bp["K"], bp["d"]
    alpha = jnp.ones((B,), dtype)

    def fwd_scan(params, Zr, K, d, alpha):
        Zb2, valid, status = s.closed_loop_rollout(params, Zr, K, d, alpha)
        return s.total_cost(params, al, Zb2)

    t_fs, _ = timeit(jax.jit(fwd_scan), params, Zr, K, d, alpha)
    print(f"fwd try (scan pair):      {t_fs*1e3:8.3f} ms")

    al_pad = s._fwd.pad_al(al)

    def fwd_pal(params, Zr, K, d, alpha):
        return s._fwd(params, al_pad, Zr, K, d, alpha, check_bounds=True)

    t_fp, _ = timeit(jax.jit(fwd_pal), params, Zr, K, d, alpha)
    print(f"fwd try (pallas fused):   {t_fp*1e3:8.3f} ms")

    # full line-searched forward pass (while_loop, usually 1 try)
    J0 = jax.jit(s.total_cost)(params, al, Zr)
    t_fpass, _ = timeit(
        jax.jit(lambda *a: s.forward_pass(*a)), params, al, Zr, bp, J0, rho, drho, al_pad
    )
    print(f"forward_pass (pallas):    {t_fpass*1e3:8.3f} ms")
    t_fpass_s, _ = timeit(
        jax.jit(lambda *a: s.forward_pass(*a)), params, al, Zr, bp, J0, rho, drho, None
    )
    print(f"forward_pass (scan):      {t_fpass_s*1e3:8.3f} ms")

    # compacted solve phases
    solver = CompactedALSolver(prob, opts, phase1_iters=14, tail_batch=min(256, B))
    t0 = time.perf_counter()
    res = solver._p1_solve(params, Zb, None)
    jax.block_until_ready(res["Z"].U)
    t_p1_compile = time.perf_counter() - t0
    t_p1, res1 = timeit(solver._p1_solve, params, Zb, None, iters=3, warmup=1)
    print(f"phase1 (14 iters, B={B}): {t_p1*1e3:8.3f} ms  (first call {t_p1_compile:.1f}s)")
    t_full, res = timeit(solver.solve, params, Zb, iters=3, warmup=1)
    print(f"compacted full solve:     {t_full*1e3:8.3f} ms -> {B/t_full:,.0f} solves/s")
    st = np.asarray(res1["status"])
    from altro_tpu.types import SolverStatus
    undone = np.isin(st, [1, 5, 6, 7])
    print(f"stragglers after phase1: {undone.sum()} / {B}")
    it = np.asarray(res["stats"].iterations_total)
    print(f"iters total: p50={np.percentile(it,50):.0f} p95={np.percentile(it,95):.0f} p99={np.percentile(it,99):.0f} max={it.max()}")


if __name__ == "__main__":
    main()
