"""Multi-chip scaling: sharded batched solves over a device mesh.

TPU-native replacement for the reference's (absent) distributed story.  The
batch of MPC scenarios is sharded over the mesh's ``"batch"`` axis with
`jax.sharding`; per-scenario solves are independent, and the only
cross-device communication is the scalar statistics folds the reference also
performs — total cost, max violation, max penalty
(`altro/augmented_lagrangian/al_solver.hpp:417-434`, `ilqr/ilqr.hpp:333`) —
which become `psum`/`pmax` collectives over ICI inside `shard_map`.

Multi-host: create the mesh over all processes' devices after
`jax.distributed.initialize()`; the same code path then rides ICI within a
slice and DCN across hosts.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import SolverOptions
from ..problem.problem import CompiledProblem, ProblemParams
from ..solver.al import ALSolver
from ..types import SolverStatus, Trajectory
from .batch import params_axes


def make_mesh(devices: Optional[Sequence] = None, axis: str = "batch") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def init_distributed(**kwargs) -> Mesh:
    """Multi-host setup: initialize `jax.distributed` (TPU pod slices
    auto-discover coordinator/process counts) and return a global mesh over
    every process's devices.  Collectives then ride ICI within a slice and
    DCN across hosts; the solver code is unchanged.
    """
    jax.distributed.initialize(**kwargs)
    return make_mesh(jax.devices())


class ShardedALSolver:
    """AL-iLQR over a scenario batch sharded across a device mesh.

    The solve itself is `vmap`ped; sharding annotations place the batch axis
    over the mesh, and a `shard_map`-wrapped reduction computes fleet-wide
    solve statistics (max violation / solved fraction) with explicit
    collectives so they ride ICI, not host transfers.
    """

    def __init__(
        self,
        prob: CompiledProblem,
        mesh: Mesh,
        opts: SolverOptions = None,
        in_axes: ProblemParams = None,
        axis: str = "batch",
    ):
        self.prob = prob
        self.mesh = mesh
        self.axis = axis
        self.solver = ALSolver(prob, opts)
        in_axes = in_axes if in_axes is not None else params_axes(x0=0)
        self.in_axes = in_axes

        vsolve = jax.vmap(self.solver.solve, in_axes=(in_axes, 0, None))

        batch_sharding = NamedSharding(mesh, P(axis))
        self.batch_sharding = batch_sharding
        replicated = NamedSharding(mesh, P())

        def solve_and_reduce(params, Z):
            res = vsolve(params, Z, None)
            # Fleet statistics with explicit mesh collectives.
            try:
                from jax import shard_map
            except ImportError:  # jax < 0.7
                from jax.experimental.shard_map import shard_map

            def local_stats(viol, status):
                v = jnp.max(viol)
                solved = jnp.sum(
                    (status == jnp.int32(SolverStatus.SOLVED)).astype(jnp.int32)
                )
                stalled = jnp.sum(
                    (status == jnp.int32(SolverStatus.SOLVED_STALLED)).astype(
                        jnp.int32
                    )
                )
                v = jax.lax.pmax(v, axis)
                solved = jax.lax.psum(solved, axis)
                stalled = jax.lax.psum(stalled, axis)
                return v[None], solved[None], stalled[None]

            viol_max, num_solved, num_stalled = shard_map(
                local_stats,
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=(P(), P(), P()),
            )(res.stats.violations, res.status)
            return res, viol_max[0], num_solved[0], num_stalled[0]

        self._solve = jax.jit(
            solve_and_reduce,
            in_shardings=(
                jax.tree_util.tree_map(
                    lambda ax: batch_sharding if ax == 0 else replicated,
                    in_axes,
                    is_leaf=lambda x: x is None or isinstance(x, int),
                ),
                batch_sharding,
            ),
        )

    def shard_batch(self, tree):
        """Place a batched pytree onto the mesh's batch axis."""
        return jax.device_put(tree, self.batch_sharding)

    def solve(self, params: ProblemParams, Z: Trajectory):
        """Solve the sharded batch.

        Returns ``(results, max_violation, n_solved, n_stalled)`` —
        ``n_solved`` counts `SolverStatus.SOLVED` only; stall exits
        (`SolverStatus.SOLVED_STALLED`) are reported separately so fleet
        statistics can't silently absorb non-convergence.
        """
        return self._solve(params, Z)
