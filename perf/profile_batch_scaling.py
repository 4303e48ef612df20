#!/usr/bin/env python
"""Per-iteration solve cost vs batch width (fixed iteration cap).

Measures the marginal cost of a lockstep iteration at each width to tune the
compaction schedule: if cost is flat below some width, shrinking the tail
batch buys nothing and the schedule should cap iterations per round instead.
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


def main():
    dtype = jnp.float32
    defn = UnicycleProblem(dtype=dtype)
    prob = defn.make_problem(add_constraints=True).compile()

    for B in (128, 256, 512, 1024, 2048, 4096, 8192, 16384):
        opts = SolverOptions(
            backward_pass="fused", forward_pass="pallas", scan_unroll=4,
            max_iterations_total=8,
        )
        s = ALSolverBatched(prob, opts)
        solve = jax.jit(s.solve)
        Z0 = defn.initial_trajectory()
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(rng.uniform(-0.1, 0.1, size=(3, B)), dtype)
        params = prob.params.replace(x0=x0s)
        Zb = to_batch_last(
            jax.tree_util.tree_map(
                lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0
            )
        )
        res = solve(params, Zb)
        jax.block_until_ready(res["Z"].U)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            res = solve(params, Zb)
        jax.block_until_ready(res["Z"].U)
        dt = (time.perf_counter() - t0) / iters
        # 8 lockstep iterations + ~1 outer overhead
        per_iter = dt / 8.0
        print(
            f"B={B:6d}: {dt*1e3:8.2f} ms for 8 iters -> {per_iter*1e3:6.2f} ms/iter"
            f"  ({per_iter/B*1e6:7.3f} us/instance-iter)"
        )


if __name__ == "__main__":
    main()
