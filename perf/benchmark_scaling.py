#!/usr/bin/env python
"""Batch/mesh scaling benchmark.

Analog of `perf/benchmark_expansions.cpp` + `perf/profile_expansions.out`
(the reference's thread-scaling study): measures batched AL-iLQR throughput
vs batch size on one device, and data-parallel scaling efficiency over a
device mesh (virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8, or a real slice).
"""
import os
import sys
import time

if "cpu" in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from altro_tpu import SolverOptions
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.parallel.mesh import ShardedALSolver, make_mesh
from altro_tpu.solver.batched import ALSolverBatched, to_batch_last


def batch_scaling():
    defn = UnicycleProblem(dtype=jnp.float32)
    defn.N = 20
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    solver = ALSolverBatched(prob, SolverOptions())
    solve = jax.jit(solver.solve)
    Z0 = defn.initial_trajectory()
    print("== batch scaling (single device, N=20) ==")
    for B in (64, 256, 1024):
        rng = np.random.default_rng(0)
        params = prob.params.replace(
            x0=jnp.asarray(rng.uniform(-0.1, 0.1, (3, B)), jnp.float32)
        )
        Zb = to_batch_last(
            jax.tree_util.tree_map(lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0)
        )
        res = solve(params, Zb)
        jax.block_until_ready(res["Z"].U)
        t0 = time.perf_counter()
        res = solve(params, Zb)
        jax.block_until_ready(res["Z"].U)
        dt = time.perf_counter() - t0
        print(f"B={B:5d}: {dt * 1e3:8.1f} ms  -> {B / dt:8.0f} solves/s")


def mesh_scaling():
    """Weak scaling of the LANE-MAJOR sharded solver (the production
    multi-chip path, `ShardedBatchedALSolver`): fixed per-device batch,
    growing mesh.  The solve is communication-free (collectives = 3 scalars
    per solve), so on real ICI hardware the efficiency bound is load
    balance; on the virtual CPU mesh the numbers below mostly measure HOST
    CORE OVERSUBSCRIPTION (8 virtual devices share this machine's 2 cores
    and XLA:CPU serializes partitions), so they are a floor, not an ICI
    prediction — see perf/scaling.out for the analysis."""
    from altro_tpu.parallel.mesh import ShardedBatchedALSolver
    from altro_tpu.solver.batched import to_batch_last

    devices = jax.devices()
    if len(devices) < 2:
        print("== mesh scaling skipped (single device) ==")
        return
    ncores = os.cpu_count()
    print(
        f"== lane-major mesh weak scaling over {len(devices)} devices "
        f"(N=20; host cores: {ncores}) =="
    )
    defn = UnicycleProblem(dtype=jnp.float32)
    defn.N = 20
    defn.__post_init__()
    prob = defn.make_problem(add_constraints=True).compile()
    per_dev = 32
    base = None
    Z0 = defn.initial_trajectory()
    for nd in (1, 2, len(devices)):
        mesh = make_mesh(devices[:nd])
        solver = ShardedBatchedALSolver(prob, mesh, SolverOptions())
        B = per_dev * nd
        rng = np.random.default_rng(0)
        params = solver.shard_params(
            prob.params.replace(
                x0=jnp.asarray(rng.uniform(-0.1, 0.1, (3, B)), jnp.float32)
            )
        )
        Zb = solver.shard_batch(
            to_batch_last(
                jax.tree_util.tree_map(
                    lambda l: jnp.broadcast_to(l, (B,) + l.shape), Z0
                )
            )
        )
        res, viol, nsolved, nstalled = solver.solve(params, Zb)
        jax.block_until_ready(res["Z"].U)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res, viol, nsolved, nstalled = solver.solve(params, Zb)
            jax.block_until_ready(res["Z"].U)
            walls.append(time.perf_counter() - t0)
        dt = float(np.median(walls))
        rate = B / dt
        if base is None:
            base = rate
        eff = rate / (base * nd) * 100
        print(
            f"devices={nd}: B={B:4d} {dt * 1e3:8.1f} ms -> {rate:8.0f} solves/s "
            f"({eff:5.1f}% of linear; solved {int(nsolved)}/{B})"
        )


def backward_comparison():
    """Backward-sweep kernels at N in {100, 512}: sequential scan vs
    associative-scan (pscan) vs fused Pallas (VERDICT-requested comparison;
    reference sequential pass: `ilqr/ilqr.hpp:402-441`)."""
    on_cpu = "cpu" in sys.argv
    Bs = (256,) if on_cpu else (1024, 4096)
    Ns = (100, 512)
    dtype = jnp.float32
    print("== backward-pass kernels: scan vs pscan vs pallas ==")
    for N in Ns:
        defn = UnicycleProblem(dtype=dtype)
        defn.N = N
        defn.__post_init__()
        prob = defn.make_problem(add_constraints=True).compile()
        for B in Bs:
            solver = ALSolverBatched(prob, SolverOptions())
            rng = np.random.default_rng(0)
            params = prob.params.replace(
                x0=jnp.asarray(rng.uniform(-0.1, 0.1, (3, B)), dtype)
            )
            Zb = to_batch_last(
                jax.tree_util.tree_map(
                    lambda l: jnp.broadcast_to(l, (B,) + l.shape),
                    defn.initial_trajectory(),
                )
            )
            al = solver.al_state_init(B, dtype)
            Zr = jax.jit(solver.rollout)(params, Zb)
            exp = jax.jit(solver.expand)(params, al, Zr)
            exp = jax.tree_util.tree_map(jax.block_until_ready, exp)
            rho = jnp.zeros((B,), dtype)

            sweeps = {"scan": jax.jit(solver.riccati_scan)}
            from altro_tpu.solver.pscan_batched import riccati_pscan_batched

            sweeps["pscan"] = jax.jit(riccati_pscan_batched)
            if not on_cpu and B % 1024 == 0:
                from altro_tpu.ops.riccati_pallas import riccati_pallas

                sweeps["pallas"] = jax.jit(riccati_pallas)
            for name, fn in sweeps.items():
                out = fn(exp, rho)
                jax.block_until_ready(out[0])
                iters = 5
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(exp, rho)
                jax.block_until_ready(out[0])
                dt = (time.perf_counter() - t0) / iters
                print(f"N={N:4d} B={B:5d} {name:7s}: {dt * 1e3:9.3f} ms/sweep")


if __name__ == "__main__":
    if "--backward" in sys.argv:
        backward_comparison()
    else:
        batch_scaling()
        mesh_scaling()
        backward_comparison()
