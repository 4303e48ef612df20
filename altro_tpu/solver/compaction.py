"""Straggler compaction for the batch-native AL-iLQR solver.

A lockstep batched solve runs until its SLOWEST instance converges: on the
unicycle-parking fleet the median instance needs ~11 total iterations, the
99th percentile ~21, the worst ~65 (`perf/benchmark_scaling.py` prints the
distribution).  Every iteration past p99 runs full-batch kernels to advance
<1% of the instances — the batched analog of the reference looping solves on
one core and blocking on the slowest (`perf/benchmark_unicycle.cpp:45-75`).

`CompactedALSolver` fixes this at the host level without touching the
per-instance algorithm: run the full batch for a capped iteration budget,
gather the unconverged stragglers into a small dense batch (`jnp.take` along
the lane axis), continue only those, and scatter results back.  Each phase
is the same jitted `ALSolverBatched.solve` program; phase boundaries restart
the inner solver (open-loop rollout from the current controls, fresh
regularization and line-search state) while duals and penalties carry over —
the same warm-start semantics the reference defines for re-solves
(`al_solver.hpp:288-302` with reset_duals=false, initial_penalty kept).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..options import SolverOptions
from ..problem.problem import CompiledProblem
from ..types import SolverStatus
from .batched import ALSolverBatched, BatchedTrajectory

# statuses that mean "ran out of a PHASE budget, still making progress" —
# only meaningful after a capped phase.  After an UNCAPPED tail round the
# instance already received the reference's own full iteration budget
# (`solver_options.hpp:23-25`), so the same codes are terminal there, exactly
# as a non-solved inner status aborts the reference's outer loop
# (`al_solver.hpp:378-381`); resuming would livelock on genuinely
# non-converging instances (each round burning max_iterations_inner again).
_RESUMABLE = (
    SolverStatus.MAX_ITERATIONS,
    SolverStatus.MAX_INNER_ITERATIONS,
    SolverStatus.MAX_OUTER_ITERATIONS,
    SolverStatus.UNSOLVED,
)


class CompactedALSolver:
    """Host-orchestrated two-level batched AL-iLQR solve.

    Parameters
    ----------
    phase1_iters : total-iteration cap for the full-batch phase.  Set it near
        the fleet's p95-p99 iteration count; stragglers past it move to the
        compact tail phase.
    tail_batch : lane width of the compact tail phase (instances gathered per
        tail round).  Must be >0.  Widths that keep the Pallas kernels
        eligible (multiples of 1024) run ~6x cheaper per lockstep iteration
        than the scan fallback (`perf/profile_batch_scaling.py`).
    tail_iters : per-round total-iteration cap for tail rounds (0 =
        uncapped).  Capped rounds re-compact between rounds, so lanes whose
        instance converged mid-round are dropped instead of idling until the
        chunk's slowest instance finishes.
    max_tail_rounds : tail rounds before giving up and reporting the last
        status (prevents livelock on genuinely non-converging instances).
    finish_stalled : the tail phase runs with
        `stalled_feasible_exits=False` and treats SOLVED_STALLED as
        resumable, so feasible-but-stalled instances keep escalating the
        penalty until their inner solve genuinely converges — drives the
        fleet to 100% SOLVED (r3 left 2/4096 SOLVED_STALLED; their
        diagnosed fix is exactly this escalation,
        perf/diagnose_stragglers.out).

    After each `solve`, `self.telemetry` holds phase wall times, straggler
    counts per round, and the iteration-count distribution — the data that
    tunes `phase1_iters` (the reference records per-iteration stats vectors
    for the same purpose, `solver_stats.hpp:54-61`).
    """

    def __init__(
        self,
        prob: CompiledProblem,
        opts: SolverOptions = None,
        *,
        phase1_iters: int = 20,
        tail_batch: int = 1024,
        tail_iters: int = 0,
        max_tail_rounds: int = 8,
        finish_stalled: bool = True,
    ):
        self.prob = prob
        self.opts = opts or SolverOptions()
        self.phase1_iters = int(phase1_iters)
        self.tail_batch = int(tail_batch)
        self.tail_iters = int(tail_iters)
        self.max_tail_rounds = int(max_tail_rounds)
        self.finish_stalled = bool(finish_stalled)
        self.telemetry: dict = {}

        # Phases never update duals from a capped (unconverged) inner solve —
        # the update is only meaningful at an inner optimum, and the
        # instances it would hit are exactly the ones that resume.
        p1_opts = self.opts.replace(
            max_iterations_total=min(
                self.phase1_iters, self.opts.max_iterations_total
            ),
            update_duals_on_failed_inner=False,
        )
        # Tail phases resume the AL state: keep duals, keep penalties.
        tail_opts = self.opts.replace(
            reset_duals=False,
            initial_penalty=0.0,
            update_duals_on_failed_inner=False,
        )
        if self.finish_stalled:
            tail_opts = tail_opts.replace(stalled_feasible_exits=False)
        if self.tail_iters > 0:
            tail_opts = tail_opts.replace(
                max_iterations_total=min(
                    self.tail_iters, tail_opts.max_iterations_total
                )
            )
        self._p1 = ALSolverBatched(prob, p1_opts)
        self._tail = ALSolverBatched(prob, tail_opts)
        self._p1_solve = jax.jit(self._p1.solve)
        self._tail_solve = jax.jit(self._tail.solve)

    # ------------------------------------------------------------- helpers
    @staticmethod
    def _gather(tree, idx):
        return jax.tree_util.tree_map(lambda leaf: leaf[..., idx], tree)

    @staticmethod
    def _scatter(tree, idx, sub):
        return jax.tree_util.tree_map(
            lambda leaf, s: leaf.at[..., idx].set(s), tree, sub
        )

    def _gather_Z(self, Z: BatchedTrajectory, idx) -> BatchedTrajectory:
        return dataclasses.replace(Z, X=Z.X[..., idx], U=Z.U[..., idx])

    # --------------------------------------------------------------- solve
    def solve(self, params, Z: BatchedTrajectory, al=None):
        """Same contract as `ALSolverBatched.solve` (batch-last dict)."""
        import time as _time

        t0 = _time.perf_counter()
        res = self._p1_solve(params, Z, al)
        jax.block_until_ready(res["status"])
        tel = {
            "phase1_s": _time.perf_counter() - t0,
            "tail_rounds": [],
        }
        resumable = _RESUMABLE
        if self.finish_stalled:
            # stall-exited feasible instances re-enter the tail, whose
            # stalled_feasible_exits=False config escalates them to SOLVED
            resumable = resumable + (SolverStatus.SOLVED_STALLED,)
        status = np.asarray(res["status"])
        undone = np.isin(status, np.asarray(resumable, status.dtype))
        rounds = 0
        while undone.any() and rounds < self.max_tail_rounds:
            rounds += 1
            t_round = _time.perf_counter()
            n_stragglers = int(undone.sum())
            idx_all = np.nonzero(undone)[0]
            for start in range(0, len(idx_all), self.tail_batch):
                chunk = idx_all[start : start + self.tail_batch]
                # pad to the fixed tail width by repeating (duplicate solves
                # write identical values back via `.set`; shapes stay static
                # for jit).  `.add` merges would double-count the duplicated
                # instance, so counter increments are masked to real rows.
                npad = self.tail_batch - len(chunk)
                if npad > 0:
                    idx = np.concatenate([chunk, np.full(npad, chunk[0])])
                    real = jnp.asarray(
                        np.concatenate(
                            [np.ones(len(chunk), np.int32), np.zeros(npad, np.int32)]
                        )
                    )
                else:
                    idx = chunk
                    real = jnp.ones((self.tail_batch,), jnp.int32)
                idx_j = jnp.asarray(idx)
                # gather every per-instance (trailing-batch) param leaf —
                # x0 and any batched cost/constraint/dynamics data
                params_t = jax.tree_util.tree_map(
                    lambda c, leaf: (
                        leaf[..., idx_j]
                        if jnp.ndim(leaf) == jnp.ndim(c) + 1
                        else leaf
                    ),
                    self.prob.params,
                    params,
                )
                Z_t = self._gather_Z(res["Z"], idx_j)
                al_t = self._gather(res["al"], idx_j)
                sub = self._tail_solve(params_t, Z_t, al_t)
                # merge: trajectories/status/duals replace, counters add
                res["Z"] = dataclasses.replace(
                    res["Z"],
                    X=res["Z"].X.at[..., idx_j].set(sub["Z"].X),
                    U=res["Z"].U.at[..., idx_j].set(sub["Z"].U),
                )
                res["al"] = self._scatter(res["al"], idx_j, sub["al"])
                res["K"] = res["K"].at[..., idx_j].set(sub["K"])
                res["d"] = res["d"].at[..., idx_j].set(sub["d"])
                res["status"] = res["status"].at[idx_j].set(sub["status"])
                st, su = res["stats"], sub["stats"]
                rows = st.rows
                cap = rows.shape[0]
                if cap > 0:
                    # splice the tail round's history after each instance's
                    # prior iterations: res.rows[T0[b]+r, :, idx[b]] =
                    # sub.rows[r, :, b] for r < tail iterations; padded
                    # duplicates and out-of-capacity rows drop
                    T0 = st.iterations_total[idx_j]  # before the .add below
                    r = jnp.arange(cap)
                    valid = (r[:, None] < su.iterations_total[None, :]) & (
                        real[None, :] > 0
                    )
                    dst = jnp.where(valid, T0[None, :] + r[:, None], cap)
                    lanes = jnp.broadcast_to(idx_j[None, :], dst.shape)
                    rows = rows.at[dst, :, lanes].set(
                        jnp.moveaxis(su.rows, 1, 2), mode="drop"
                    )
                res["stats"] = st.replace(
                    iterations_inner=st.iterations_inner.at[idx_j].set(
                        su.iterations_inner
                    ),
                    iterations_outer=st.iterations_outer.at[idx_j].add(
                        su.iterations_outer * real
                    ),
                    iterations_total=st.iterations_total.at[idx_j].add(
                        su.iterations_total * real
                    ),
                    cost=st.cost.at[idx_j].set(su.cost),
                    cost_decrease=st.cost_decrease.at[idx_j].set(su.cost_decrease),
                    gradient=st.gradient.at[idx_j].set(su.gradient),
                    alpha=st.alpha.at[idx_j].set(su.alpha),
                    improvement_ratio=st.improvement_ratio.at[idx_j].set(
                        su.improvement_ratio
                    ),
                    violations=st.violations.at[idx_j].set(su.violations),
                    max_penalty=st.max_penalty.at[idx_j].set(su.max_penalty),
                    regularization=st.regularization.at[idx_j].set(
                        su.regularization
                    ),
                    rows=rows,
                )
            jax.block_until_ready(res["status"])
            status = np.asarray(res["status"])
            undone = np.isin(status, np.asarray(resumable, status.dtype))
            if self.tail_iters == 0:
                # every straggler just ran an UNCAPPED round (the full
                # reference iteration budget): budget-exhaustion statuses
                # are terminal, see _RESUMABLE note above
                undone &= False
            tel["tail_rounds"].append(
                {
                    "stragglers": n_stragglers,
                    "wall_s": _time.perf_counter() - t_round,
                }
            )
        it = np.asarray(res["stats"].iterations_total)
        tel["iters_p50"] = float(np.percentile(it, 50))
        tel["iters_p95"] = float(np.percentile(it, 95))
        tel["iters_p99"] = float(np.percentile(it, 99))
        tel["iters_max"] = int(it.max())
        tel["total_s"] = _time.perf_counter() - t0
        self.telemetry = tel
        return res
