#!/usr/bin/env python
"""Sequential-scan vs associative-scan (pscan) vs Pallas Riccati crossover.

VERDICT r3 Weak #6: the parallel-prefix Riccati (`solver/pscan_batched.py`,
arXiv:1809.06360) is oracle-tested but no artifact showed WHERE (or
whether) it beats the sequential sweep on TPU.  This measures the three
backward-sweep kernels on identical synthetic expansion data at
N ∈ {100, 512, 2048, 8192}, B=1024, f32 — the honest experiment the
"Riccati scan sharded over the horizon for long problems" north-star claim
needs.

The associative scan does O(N) combine work at O(log N) depth but each
combine is ~6 (n+m)-sized matrix products vs the sequential step's ~8
n/m-sized ones, and XLA's associative_scan materializes every level's
elements through HBM.  The sequential scan at batch B=1024 already keeps
all lanes busy, so the pscan's win window is long-N, latency-bound cases.
Measured numbers land in perf/pscan_crossover.out; PARITY.md records the
verdict.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python perf/pscan_crossover.py
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
from altro_tpu.solver.batched import ALSolverBatched
from altro_tpu.solver.pscan_batched import riccati_pscan_batched

B = 1024
N_SWEEP = (100, 512, 2048, 8192)
n, m = 3, 2


def synth_exp(N, rng, dtype=jnp.float32):
    """Stable synthetic expansions: A ≈ I + small, luu PD — the magnitudes
    of the unicycle problem's Riccati data."""
    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(0.0, scale, shape), dtype)

    eye_n = jnp.eye(n, dtype=dtype)[None, :, :, None]

    def gram(L):
        # L Lᵀ per (k, b) as broadcast-multiply-reduce (einsum lowers to a
        # dot_general whose TPU padding blows 64x past HBM at N=8192)
        return (L[:, :, None, :, :] * L[:, None, :, :, :]).sum(axis=3)

    A = eye_n + r(N, n, n, B, scale=0.02)
    Bd = r(N, n, m, B, scale=0.05)
    luu = gram(r(N + 1, m, m, B, scale=0.05)) + jnp.eye(m, dtype=dtype)[
        None, :, :, None
    ] * 0.1
    lxx = gram(r(N + 1, n, n, B, scale=0.05)) + eye_n * 0.1
    return dict(
        A=A, B=Bd, lxx=lxx,
        lxu=r(N + 1, n, m, B, scale=0.01),
        luu=luu,
        lx=r(N + 1, n, B, scale=0.1),
        lu=r(N + 1, m, B, scale=0.1),
    )


def time_fn(fn, exp, rho, reps=5, chain=16):
    """Amortized device timing: `chain` sweeps run inside ONE jitted
    fori_loop with a data dependency through rho (the single-dispatch
    protocol measures the ~30-40 ms axon tunnel RTT, not the sweep)."""
    out = fn(exp, rho)
    jax.block_until_ready(out[0])

    def chained(exp, rho):
        def body(i, r):
            o = fn(exp, r)
            dep = o[1].reshape(-1)[0]  # d[0,0,0]
            return r + jnp.where(jnp.isfinite(dep), dep * 0.0, 0.0)

        return jax.lax.fori_loop(0, chain, body, rho)

    cf = jax.jit(chained)
    jax.block_until_ready(cf(exp, rho))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(cf(exp, rho))
        walls.append(time.perf_counter() - t0)
    return out, float(np.median(walls)) / chain


def main() -> None:
    defn = UnicycleProblem(dtype=jnp.float32)
    prob = defn.make_problem(add_constraints=True).compile()
    opts = SolverOptions(scan_unroll=4)
    solver = ALSolverBatched(prob, opts)
    from altro_tpu.ops.riccati_pallas import TILE, riccati_pallas

    rng = np.random.default_rng(0)
    rho = jnp.zeros((B,), jnp.float32)
    rows = []
    for N in N_SWEEP:
        exp = synth_exp(N, rng)
        seq = jax.jit(solver.riccati_scan)
        psc = jax.jit(riccati_pscan_batched)
        pal = jax.jit(lambda e, r: riccati_pallas(e, r, interpret=False))
        (Ks, ds, *_), t_seq = time_fn(seq, exp, rho)
        try:
            (Kp, dp, *_), t_psc = time_fn(psc, exp, rho)
            err = float(jnp.max(jnp.abs(Kp - Ks)))
        except Exception:  # HBM overflow at very long N
            t_psc, err = None, None
        try:
            (Kl, dl, *_), t_pal = time_fn(pal, exp, rho)
            pal_err = float(jnp.max(jnp.abs(Kl - Ks)))
        except Exception:  # VMEM overflow at very long N
            t_pal, pal_err = None, None
        row = {
            "N": N, "B": B,
            "seq_scan_ms": round(t_seq * 1e3, 3),
            "pscan_ms": None if t_psc is None else round(t_psc * 1e3, 3),
            "pallas_ms": None if t_pal is None else round(t_pal * 1e3, 3),
            "pscan_speedup_vs_seq": (
                None if t_psc is None else round(t_seq / t_psc, 3)
            ),
            "pscan_K_maxerr_vs_seq": err,
            "pallas_K_maxerr_vs_seq": pal_err,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    cross = next(
        (r["N"] for r in rows if (r["pscan_speedup_vs_seq"] or 0) > 1.0), None
    )
    print(json.dumps({
        "summary": "pscan vs sequential Riccati sweep crossover",
        "first_N_where_pscan_wins": cross,
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
