"""Augmented-Lagrangian outer loop.

Functional analog of `AugmentedLagrangianiLQR<n,m>`
(`altro/augmented_lagrangian/al_solver.hpp:28-443`): repeatedly solve the
AL-penalized problem with the inner iLQR solver, then update duals, check
convergence, and scale penalties.  Dual/penalty state is an explicit pytree
(`ALState`), so warm starting across solves — the reference's MPC workflow
(`al_solver.hpp:288-302`, `solver_options.hpp:47-48`) — is just passing the
previous state back in, and checkpointing is serializing a pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, tree_select
from ..options import SolverOptions
from ..problem.problem import CompiledProblem, ProblemParams
from ..types import (
    SolverStats,
    SolverStatus,
    Trajectory,
    stats_init,
    stats_log,
)
from .functions import ALState, ProblemFunctions
from .ilqr import ILQRSolver


@pytree_dataclass
class ALResult:
    Z: Trajectory
    al: tuple
    status: jax.Array
    stats: SolverStats
    K: jax.Array
    d: jax.Array


class ALSolver:
    """AL-iLQR solver over a compiled problem."""

    def __init__(self, prob: CompiledProblem, opts: SolverOptions = None):
        self.prob = prob
        self.opts = opts or SolverOptions()
        self.ilqr = ILQRSolver(prob, self.opts)
        self.fns: ProblemFunctions = self.ilqr.fns
        self._instrumented = None
        if self.opts.matmul_precision:
            from .._pytree import with_matmul_precision

            self.solve = with_matmul_precision(self.opts.matmul_precision)(
                self.solve
            )

    def init_al_state(self, dtype=None) -> ALState:
        return self.fns.al_state_init(dtype)

    @property
    def timer(self):
        """Phase profiler of the last instrumented solve (`GetTimer()`
        analog, `solver_stats.hpp:105`); None until a solve ran with
        `profiler_enable` or non-silent `verbose`."""
        return self._instrumented.timer if self._instrumented else None

    def solve(
        self,
        params: ProblemParams,
        Z: Trajectory,
        al: ALState = None,
    ) -> ALResult:
        """Full constrained solve (`al_solver.hpp:305-334`).

        `al` warm-starts duals/penalties; options `reset_duals` /
        `initial_penalty` control how much carries over (`al_solver.hpp:288-302`).
        """
        opts = self.opts
        fns = self.fns
        from ..options import LogLevel

        if opts.profiler_enable or opts.verbose > LogLevel.SILENT:
            # Live observability (`al_solver.hpp:307-331`): eager solves route
            # to the host-stepped mirror with Timer scopes + live log rows;
            # traced (jit/vmap) solves stay on the fused path.
            from .instrumented import InstrumentedSolve, is_traced

            if not is_traced(params, Z, al):
                if self._instrumented is None:
                    self._instrumented = InstrumentedSolve(self)
                return self._instrumented.solve(params, Z, al)

        dt = Z.X.dtype
        N, n, m = self.prob.N, self.prob.n, self.prob.m

        if al is None:
            al = fns.al_state_init(dt)
        if opts.reset_duals:
            al = fns.reset_duals(al)
        if opts.initial_penalty > 0:
            al = fns.set_penalty(al, opts.initial_penalty)

        stats = stats_init(opts.stats_capacity, dt)
        cvals0 = fns.constraint_values(params, Z)
        stats = stats_log(
            stats,
            violations=fns.max_violation(cvals0) if cvals0 else jnp.zeros((), dt),
            max_penalty=fns.max_penalty(al).astype(dt),
        )

        if not self.prob.constraint_families:
            # Unconstrained: a single inner solve, like wrapping a plain iLQR.
            res = self.ilqr.solve(params, (), Z, stats)
            return ALResult(
                Z=res.Z, al=(), status=res.status, stats=res.stats, K=res.K, d=res.d
            )

        def cond(c):
            return ~c["done"]

        def body(c):
            Z, al, stats = c["Z"], c["al"], c["stats"]
            res = self.ilqr.solve(params, al, Z, stats)
            Z, stats = res.Z, res.stats

            # dual update on the solved trajectory (`al_solver.hpp:337-345`);
            # the reference uses the constraint values cached by the last cost
            # evaluation, which is the accepted forward-pass trajectory == Z.
            cvals = fns.constraint_values(params, Z)
            al_new = fns.update_duals(al, cvals)
            viol = fns.max_violation(cvals)
            pen = fns.max_penalty(al_new).astype(dt)
            outer = stats.iterations_outer + 1
            stats = stats.replace(iterations_outer=outer)
            stats = stats_log(stats, violations=viol, max_penalty=pen)

            # IsDone (`al_solver.hpp:369-401`).  A stall-exited inner solve
            # (SOLVED_STALLED) continues the outer loop like a solved one —
            # the AL terms changed, so the next inner solve is fresh work —
            # but a solve that finishes constraint-satisfied on a stalled
            # inner result reports SOLVED_STALLED, not SOLVED.
            inner_solved = res.status == jnp.int32(SolverStatus.SOLVED)
            inner_ok = inner_solved | (
                res.status == jnp.int32(SolverStatus.SOLVED_STALLED)
            )
            sat = viol < opts.constraint_tolerance
            pen_hi = pen > opts.maximum_penalty
            outer_hi = outer >= opts.max_iterations_outer
            total_hi = stats.iterations_total >= opts.max_iterations_total
            status = jnp.where(
                ~inner_ok,
                res.status,
                jnp.where(
                    sat,
                    jnp.where(
                        inner_solved,
                        jnp.int32(SolverStatus.SOLVED),
                        jnp.int32(SolverStatus.SOLVED_STALLED),
                    ),
                    jnp.where(
                        pen_hi,
                        jnp.int32(SolverStatus.MAX_PENALTY),
                        jnp.where(
                            outer_hi,
                            jnp.int32(SolverStatus.MAX_OUTER_ITERATIONS),
                            jnp.where(
                                total_hi,
                                jnp.int32(SolverStatus.MAX_ITERATIONS),
                                jnp.int32(SolverStatus.UNSOLVED),
                            ),
                        ),
                    ),
                ),
            )
            done = (~inner_ok) | sat | pen_hi | outer_hi | total_hi
            # penalties scale only when continuing (`al_solver.hpp:324-332`)
            al_next = tree_select(done, al_new, fns.update_penalties(al_new))
            return {
                "Z": Z,
                "al": al_next,
                "stats": stats,
                "status": status,
                "done": done,
                "K": res.K,
                "d": res.d,
            }

        init = {
            "Z": Z,
            "al": al,
            "stats": stats,
            "status": jnp.int32(SolverStatus.UNSOLVED),
            "done": jnp.zeros((), bool),
            "K": jnp.zeros((N, m, n), dt),
            "d": jnp.zeros((N, m), dt),
        }
        out = jax.lax.while_loop(cond, body, init)
        result = ALResult(
            Z=out["Z"],
            al=out["al"],
            status=out["status"],
            stats=out["stats"],
            K=out["K"],
            d=out["d"],
        )
        self._maybe_log(result)
        return result

    def _maybe_log(self, result: ALResult) -> None:
        """Console iteration table at the configured verbosity
        (`al_solver.hpp:318-331`).  Only fires on eager (non-traced) solves."""
        from ..options import LogLevel

        if self.opts.verbose == LogLevel.SILENT:
            return
        if isinstance(result.stats.length, jax.core.Tracer):
            return
        from ..utils.logging import SolverLogger

        logger = SolverLogger(self.opts.verbose)
        logger.set_tolerances(
            self.opts.cost_tolerance,
            self.opts.constraint_tolerance,
            self.opts.gradient_tolerance,
        )
        logger.print_solve_summary(result.stats, result.status)

    # Convenience pieces mirroring the reference's public methods -----------
    def max_violation(self, params, Z):
        """`AugmentedLagrangianiLQR::MaxViolation` (`al_solver.hpp:405-408`)."""
        return self.fns.max_violation(self.fns.constraint_values(params, Z))

    def num_constraints(self, k=None) -> int:
        """Constraint rows at knot k or total (`al_solver.hpp:252-269`)."""
        fams = self.prob.constraint_families
        if k is None:
            return sum(f.dim * len(f.knots) for f in fams)
        return sum(f.dim for f in fams if k in f.knots)

    def constraint_info(self, params, Z, sort: bool = False):
        """Per-constraint violation report
        (`AugmentedLagrangianiLQR::GetConstraintInfo`, `al_solver.hpp:86-104`).

        Returns a list of dicts {label, knot, violation (np array), cone}
        for every (constraint, knot) pair, optionally sorted by max
        violation.
        """
        import numpy as np

        from ..problem.constraints import cone_violation

        cvals = self.fns.constraint_values(params, Z)
        info = []
        for fam, c in zip(self.prob.constraint_families, cvals):
            v = np.asarray(cone_violation(fam.cone, c))
            for i, k in enumerate(fam.knots):
                info.append(
                    {
                        "label": fam.label,
                        "knot": int(k),
                        "violation": v[i],
                        "cone": fam.cone.name,
                    }
                )
        if sort:
            info.sort(key=lambda e: -float(e["violation"].max(initial=0.0)))
        else:
            info.sort(key=lambda e: e["knot"])
        return info

    def print_violations(self, params, Z, sort: bool = False, precision: int = 4):
        """`AugmentedLagrangianiLQR::PrintViolations` (`al_solver.hpp:68-74`)."""
        import numpy as np

        info = self.constraint_info(params, Z, sort=sort)
        print(f"Got {len(info)} constraints")
        for e in info:
            with np.printoptions(precision=precision):
                print(f"{e['label']} [{e['cone']}] @ knot {e['knot']}: {e['violation']}")

    def update_duals(self, params, Z, al):
        return self.fns.update_duals(al, self.fns.constraint_values(params, Z))

    def update_penalties(self, al):
        return self.fns.update_penalties(al)
