#!/usr/bin/env python
"""MPC re-solve benchmark (BASELINE config 4: warm-started unicycle
re-solves at a 100 Hz budget).

Measures on the real chip:
  * single-controller warm-started re-solve latency (the reference's MPC
    workflow, `perf/benchmark_unicycle.cpp:45-75` — one solver re-solved
    in a loop with the previous trajectory/duals as the warm start);
  * a vmapped fleet of controllers stepping in lockstep — the TPU-native
    version of "many vehicles re-planning at 100 Hz", where the batch axis
    is what the chip is for.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python perf/benchmark_mpc.py
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from altro_tpu import SolverOptions
from altro_tpu.models.problems import UnicycleProblem
from altro_tpu.models.unicycle import unicycle_rk4
from altro_tpu.solver.mpc import MPC


def single(defn, prob, steps=60):
    mpc = MPC(prob, SolverOptions(), shift=True)
    model = unicycle_rk4()
    state = mpc.init(defn.initial_trajectory())
    x = jnp.zeros(3)
    lat = []
    for _ in range(steps):
        t0 = time.perf_counter()
        u0, state = mpc.step(state, x)
        jax.block_until_ready(u0)
        lat.append((time.perf_counter() - t0) * 1e3)
        x = model(x, u0, 0.0, defn.h)
    lat = np.asarray(lat[5:])
    dist = float(jnp.linalg.norm(x - jnp.asarray(defn.xf)))
    return {
        "mode": "single_controller",
        "resolve_ms_median": round(float(np.median(lat)), 3),
        "resolve_ms_p95": round(float(np.percentile(lat, 95)), 3),
        "within_10ms_budget_pct": round(float((lat < 10.0).mean() * 100), 1),
        "final_goal_dist_m": round(dist, 5),
    }


def fleet(defn, prob, B=1024, steps=30):
    mpc = MPC(prob, SolverOptions(), shift=True)
    model = unicycle_rk4()

    Z0 = defn.initial_trajectory()
    state1 = mpc.init(Z0)
    stateB = jax.tree_util.tree_map(
        lambda l: jnp.broadcast_to(l, (B,) + l.shape), state1
    )
    rng = np.random.default_rng(0)
    xB = jnp.asarray(rng.uniform(-0.1, 0.1, size=(B, 3)), jnp.float32)

    step_v = jax.jit(jax.vmap(lambda s, x: mpc.step(s, x)))
    model_v = jax.vmap(lambda x, u: model(x, u, 0.0, defn.h))

    (u0, stateB2) = step_v(stateB, xB)  # compile
    jax.block_until_ready(u0)
    lat = []
    for _ in range(steps):
        t0 = time.perf_counter()
        u0, stateB = step_v(stateB, xB)
        jax.block_until_ready(u0)
        lat.append((time.perf_counter() - t0) * 1e3)
        xB = model_v(xB, u0)
    lat = np.asarray(lat[3:])
    med = float(np.median(lat))
    return {
        "mode": f"fleet_{B}_controllers",
        "step_ms_median": round(med, 3),
        "step_ms_p95": round(float(np.percentile(lat, 95)), 3),
        "within_10ms_budget_pct": round(float((lat < 10.0).mean() * 100), 1),
        "controller_steps_per_s": round(B * 1000.0 / med, 1),
    }


def main() -> None:
    defn = UnicycleProblem(dtype=jnp.float32)
    prob = defn.make_problem(add_constraints=True).compile()
    print(json.dumps(single(defn, prob)), flush=True)
    print(json.dumps(fleet(defn, prob)), flush=True)


if __name__ == "__main__":
    main()
