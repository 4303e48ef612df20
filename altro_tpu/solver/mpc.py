"""Receding-horizon MPC on top of the AL-iLQR solver.

The reference's MPC story is warm starting: the solution trajectory is
jointly owned with the caller and reused as the next initial guess
(`altro/ilqr/ilqr.hpp:222-235`), and duals/penalties persist across solves
unless reset (`al_solver.hpp:288-302`, `solver_options.hpp:47-48`); its MPC
benchmark re-solves the same problem in a loop
(`perf/benchmark_unicycle.cpp:45-75`).

Here that workflow is explicit state: `MPCState = (Z, al)` threads through
`step()`, and the solve is one jitted function of (x0, warm state) so a
100 Hz loop never retraces.  For fleets use `BatchedMPC` (lane-major
batch-native re-solves); `vmap` over the per-instance `step` also works but
leaves the TPU idle (batch-first layout, tiny per-knot matrices — measured
~500x slower at B=256, perf/mpc_latency.out).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass
from ..options import SolverOptions
from ..problem.problem import CompiledProblem, ProblemParams
from ..types import Trajectory
from .al import ALSolver


@pytree_dataclass
class MPCState:
    Z: Trajectory
    al: tuple
    status: jax.Array
    iterations: jax.Array


class MPC:
    """Warm-started receding-horizon controller.

    Options default to the reference's warm-start configuration: duals are
    kept across re-solves (`reset_duals=False`) and penalties restart at
    `initial_penalty` (matching `al_solver.hpp:288-302` when
    `reset_duals=false`).

    `shift=True` advances the warm-start guess by one knot each step
    (receding horizon); `shift=False` re-solves the same horizon
    (the reference benchmark's behavior).
    """

    def __init__(
        self,
        prob: CompiledProblem,
        opts: SolverOptions = None,
        shift: bool = True,
    ):
        opts = opts or SolverOptions()
        if opts.reset_duals:
            opts = opts.replace(reset_duals=False)
        self.opts = opts
        self.prob = prob
        self.solver = ALSolver(prob, opts)
        self.shift = shift
        self._solve = jax.jit(self.solver.solve)

    def init(self, Z0: Trajectory) -> MPCState:
        al = self.solver.init_al_state(Z0.X.dtype)
        return MPCState(
            Z=Z0,
            al=al,
            status=jnp.int32(1),
            iterations=jnp.zeros((), jnp.int32),
        )

    def step(self, state: MPCState, x0, params: Optional[ProblemParams] = None):
        """Re-solve from measured state `x0`; returns (u0, new_state).

        `params` optionally overrides other problem data (moving references,
        obstacle updates) — same pytree structure, no recompile.
        """
        params = (params or self.prob.params).replace(x0=jnp.asarray(x0))
        res = self._solve(params, state.Z, state.al)
        u0 = res.Z.U[..., 0, :]
        Zwarm = _shift_trajectory(res.Z) if self.shift else res.Z
        new_state = MPCState(
            Z=Zwarm,
            al=res.al,
            status=res.status,
            iterations=res.stats.iterations_total,
        )
        return u0, new_state


def _shift_trajectory(Z: Trajectory) -> Trajectory:
    """Advance the warm-start guess one knot: controls shift left, the last
    control repeats; states shift correspondingly (the solver re-rollouts
    states from x0 anyway, `ilqr.hpp:453-459`)."""
    U = jnp.concatenate([Z.U[..., 1:, :], Z.U[..., -1:, :]], axis=-2)
    X = jnp.concatenate([Z.X[..., 1:, :], Z.X[..., -1:, :]], axis=-2)
    return Z.replace(X=X, U=U)


class BatchedMPC:
    """Warm-started receding-horizon control for a FLEET of vehicles.

    The per-instance `MPC` under `vmap` puts the batch axis first, which
    leaves every per-knot matrix tiny and the TPU idle (measured ~500x
    slower than the lane-major batch-native solver at B=256).  This class
    runs the fleet through `ALSolverBatched` instead: one jitted lane-major
    solve per control tick, warm-started from each instance's previous
    trajectory and duals — the batched analog of the reference's re-solve
    loop (`perf/benchmark_unicycle.cpp:45-75`).

    States/controls are batch-last: `x0` is `[n, B]`, `step` returns
    `u0 [m, B]`.

    Real-time use: cap the per-tick compute with
    `SolverOptions(max_iterations_total=K)` — the fleet step is lockstep,
    so ONE never-converging instance otherwise runs to the full iteration
    cap every tick and the whole fleet waits (measured: 5 unconverged of
    4096 made ticks 28x slower, perf/mpc_latency.out).  A capped instance
    reports MAX_ITERATIONS that tick and keeps improving across ticks via
    the warm start — standard real-time iLQR practice.
    """

    def __init__(
        self,
        prob: CompiledProblem,
        opts: SolverOptions = None,
        shift: bool = True,
    ):
        from .batched import ALSolverBatched

        opts = opts or SolverOptions()
        if opts.reset_duals:
            opts = opts.replace(reset_duals=False)
        self.opts = opts
        self.prob = prob
        self.solver = ALSolverBatched(prob, opts)
        self.shift = shift
        self._solve = jax.jit(self.solver.solve)

    def init(self, Zb) -> MPCState:
        """`Zb`: batch-last initial-guess trajectory (`to_batch_last`)."""
        B = Zb.X.shape[-1]
        al = self.solver.al_state_init(B, Zb.X.dtype)
        return MPCState(
            Z=Zb,
            al=al,
            status=jnp.full((B,), 1, jnp.int32),
            iterations=jnp.zeros((B,), jnp.int32),
        )

    def step(self, state: MPCState, x0, params: Optional[ProblemParams] = None):
        """Re-solve the whole fleet from measured states `x0 [n, B]`;
        returns (u0 [m, B], new_state)."""
        params = (params or self.prob.params).replace(x0=jnp.asarray(x0))
        res = self._solve(params, state.Z, state.al)
        Zsol = res["Z"]
        u0 = Zsol.U[0]
        Zwarm = _shift_batch_last(Zsol) if self.shift else Zsol
        new_state = MPCState(
            Z=Zwarm,
            al=res["al"],
            status=res["status"],
            iterations=res["stats"].iterations_total,
        )
        return u0, new_state


def _shift_batch_last(Z):
    """Batch-last (`[N, dim, B]`) analog of `_shift_trajectory` — time is
    the leading axis in the lane-major layout."""
    U = jnp.concatenate([Z.U[1:], Z.U[-1:]], axis=0)
    X = jnp.concatenate([Z.X[1:], Z.X[-1:]], axis=0)
    return Z.replace(X=X, U=U)
