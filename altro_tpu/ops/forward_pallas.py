"""Fused Pallas TPU kernel for the forward pass: closed-loop rollout + cost.

The XLA forward pass is two separate time scans (`solver/batched.py`:
`closed_loop_rollout` + `total_cost`), each a chain of N tiny sequential
steps whose carries and intermediates round-trip through HBM — measured
~3.6 ms per line-search try at B=4096, N=100 on v5e, ~50x above the HBM
bandwidth bound.  This kernel runs the whole try in one pass with the state
carry resident in VMEM:

  * grid = (batch_tiles, N/T): the time axis iterates innermost in blocks of
    T steps, so Pallas double-buffers the next block's (X, U, K, d, λ, ρ)
    streams while the current block computes; VMEM scratch carries
    (x̄, J, valid, status) across blocks.
  * each time step fuses: ū = u + K(x̄−x) + αd, the stage cost (quadratic
    closed form) + AL penalty terms of every constraint family active at
    that knot, the RK4/Euler dynamics step, and the rollout divergence guard
    (`ilqr.hpp:468-499` semantics: freeze the state on the first violation,
    record kStateLimit/kControlLimit).
  * the terminal cost and terminal-constraint AL terms are added in the last
    time block, so the kernel's J equals `total_cost` of the trajectory it
    writes (same accumulation the reference does across `RolloutClosedLoop`
    + `Cost`, `ilqr.hpp:512-558`).

With α = 0 (and K = d = 0) the same program is the open-loop rollout + cost
(`ilqr.hpp:453-459`); a second instantiation without the divergence guard
matches the reference's unguarded open rollout.

Problem params stream two ways, decided PER LEAF at call time (r4):
  * shared across the batch → SMEM scalars, read once per tile (free);
  * per-instance (trailing batch axis vs the canonical shape, the
    `batch_axes` convention) → VMEM tiles like x0, fetched once per batch
    tile since their block index ignores the time grid axis.
This is what lets the randomized fleet (per-instance obstacle layouts /
goal refs / dynamics scalars — BASELINE config 5) run on the fused kernels
instead of the ~8x-slower XLA scans; the reference is indifferent to which
problem object each solve in its loop uses
(`perf/benchmark_unicycle.cpp:45-75`), and so is this kernel.  Kernel
variants are cached per (signature, batch tiles).

Eligibility (checked at build; the solver falls back to the XLA scans
otherwise): one shared-structure rk4/euler dynamics family whose continuous
fn traces on tile-shaped states, quadratic cost families, canned constraint
structures (goal / control bound / circle — `problem/constraints.py`
structure tags), contiguous knot ranges, zero/negative-orthant cones, and
batch % 1024 == 0.  Per-knot (stacked) cost params must be batch-shared
(per-knot AND per-instance falls back — `param_sig`).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem.constraints import Cone
from ..problem.costs import _quadcost_eval
from ..types import SolverStatus

SUB = 8
LANE = 128
TILE = SUB * LANE

_UNSOLVED = int(SolverStatus.UNSOLVED)
_STATE_LIMIT = int(SolverStatus.STATE_LIMIT)
_CONTROL_LIMIT = int(SolverStatus.CONTROL_LIMIT)

# param keys streamed per constraint structure kind
_STRUCT_KEYS = {
    "goal": ("xf",),
    "control_bound": ("lb", "ub"),
    "circle": ("cx", "cy", "r"),
}


class Ineligible(Exception):
    """Problem structure not supported by the fused kernel."""


def _contiguous(knots: np.ndarray) -> tuple[int, int]:
    if len(knots) == 0:
        raise Ineligible("empty knot range")
    if len(knots) > 1 and not np.all(np.diff(knots) == 1):
        raise Ineligible("non-contiguous knot range")
    return int(knots[0]), int(knots[-1])


def _scalar_leaves(params) -> list:
    """Flatten a params pytree into scalar/small-vector leaves; Ineligible
    beyond rank 1 (the SMEM/tile passing convention: scalars read as SMEM
    values, vector leaves as per-element SMEM rows rebuilt with
    `jnp.stack` inside the kernel — e.g. the quadrotor's inertia [3])."""
    leaves = jax.tree_util.tree_leaves(params)
    for leaf in leaves:
        if np.ndim(leaf) > 1:
            raise Ineligible(
                "dynamics params must be scalars or vectors for the kernel"
            )
    return leaves


def _pick_T(N: int, bytes_per_step: int, budget: int = 6 * 2**20, cap: int = 32) -> int:
    """Largest divisor of N with double-buffered stream bytes under budget."""
    best = 1
    for T in range(1, min(N, cap) + 1):
        if N % T == 0 and 2 * T * bytes_per_step <= budget:
            best = T
    return best


class ForwardKernel:
    """Fused closed-loop-rollout + total-cost kernel for one problem.

    Build once per (CompiledProblem, SolverOptions); call per line-search
    try.  `__call__(params, al_pad, Z, K, d, alpha, check_bounds)` returns
    `(Xnext [N,n,B], Ubar [N,m,B], J [B], valid [B], status [B])` with the
    batch in the last axis, exactly matching the XLA pair
    (`closed_loop_rollout` then `total_cost`).
    """

    def __init__(
        self,
        prob,
        opts,
        *,
        interpret: bool = False,
        dtype=jnp.float32,
        sub: int = SUB,
        lane: int = LANE,
    ):
        self.prob = prob
        self.opts = opts
        self.interpret = interpret
        self.dtype = jnp.dtype(dtype)
        self.sub = sub
        self.lane = lane
        self.tile = sub * lane
        N, n, m = prob.N, prob.n, prob.m
        self.N, self.n, self.m = N, n, m

        # ---------------- eligibility + static structure
        if len(prob.dynamics_families) != 1:
            raise Ineligible("multiple dynamics families")
        dyn = prob.dynamics_families[0]
        if not dyn.shared:
            raise Ineligible("per-knot dynamics params")
        if dyn.model is None or dyn.model.method not in ("rk4", "euler"):
            raise Ineligible("unknown integrator")
        self._cont_fn = dyn.model.continuous_fn
        self._method = dyn.model.method
        dyn_leaves = _scalar_leaves(prob.params.dynamics[0])
        self._dyn_leaf_count = len(dyn_leaves)
        self._dyn_leaf_shapes = [np.shape(l) for l in dyn_leaves]
        self._dyn_treedef = jax.tree_util.tree_structure(prob.params.dynamics[0])
        # trace-check the continuous fn on tile-shaped states
        try:
            probe = jax.eval_shape(
                lambda p, x, u: self._cont_fn(p, x, u, 0.0),
                prob.params.dynamics[0],
                jax.ShapeDtypeStruct((n, self.sub, self.lane), jnp.float32),
                jax.ShapeDtypeStruct((m, self.sub, self.lane), jnp.float32),
            )
        except Exception as e:  # noqa: BLE001 - any trace failure disqualifies
            raise Ineligible(f"continuous fn does not trace on tiles: {e}")
        if probe.shape != (n, self.sub, self.lane):
            raise Ineligible("continuous fn does not broadcast over tiles")

        self._cost_fams = []
        for fi, fam in enumerate(prob.cost_families):
            if fam.fn is not _quadcost_eval:
                raise Ineligible("non-quadratic cost family")
            k0, k1 = _contiguous(fam.knots)
            # per-knot stacked params are streamed as flattened SMEM rows
            self._cost_fams.append(
                dict(fi=fi, k0=k0, k1=k1, stacked=not fam.shared)
            )

        self._con_fams = []
        for fi, fam in enumerate(prob.constraint_families):
            con = fam.constraint
            if con is None or con.structure is None:
                raise Ineligible("opaque constraint fn")
            if not fam.shared:
                raise Ineligible("per-knot constraint params")
            if fam.cone not in (Cone.ZERO, Cone.NEGATIVE_ORTHANT):
                raise Ineligible("unsupported cone for fused kernel")
            k0, k1 = _contiguous(fam.knots)
            self._con_fams.append(
                dict(
                    fi=fi, k0=k0, k1=k1, p=fam.dim, cone=fam.cone,
                    structure=con.structure,
                    stage=k0 <= N - 1, terminal=k1 == N,
                )
            )

        # ordered registry of streamable problem params: (name, canonical
        # shape, stacked) — spec building and array assembly iterate this in
        # lockstep so SMEM/VMEM placement per signature stays consistent
        self._param_info = [
            (name, np.shape(canon), stacked)
            for name, canon, stacked, _ in self._iter_params(prob.params)
        ]
        # stacked (per-knot) cost params can be per-instance too, but only
        # when the family covers the full knot range: stage rows then stream
        # with the trajectory and the terminal row rides a separate tile
        self._stacked_full = {
            f"cost{f['fi']}_{p}": (f["k0"] == 0 and f["k1"] == N)
            for f in self._cost_fams
            if f["stacked"]
            for p in ("Q", "R", "H", "q", "r", "c")
        }

        # ---------------- block geometry
        sum_p = sum(f["p"] + 1 for f in self._con_fams if f["stage"])
        per_step = (n + m + m * n + m + sum_p) * self.tile * 4
        per_step += (n + m) * self.tile * 4  # outputs
        self.T = _pick_T(N, per_step)
        self.NT = N // self.T

        self._kernels = {}

    # ---------------------------------------------------------- param plumbing
    def _iter_params(self, params):
        """Yield (name, canonical_leaf, stacked, actual_leaf) for every
        streamable problem param in the fixed order (dynamics, costs,
        constraints) shared by `_build_specs` and `__call__`."""
        canon = self.prob.params
        dyn_c = jax.tree_util.tree_leaves(canon.dynamics[0])
        dyn_a = jax.tree_util.tree_leaves(params.dynamics[0])
        for i, (c, a) in enumerate(zip(dyn_c, dyn_a)):
            yield f"dyn{i}", c, False, a
        for f in self._cost_fams:
            fi = f["fi"]
            cp, ap = canon.costs[fi], params.costs[fi]
            for pname in ("Q", "R", "H", "q", "r", "c"):
                yield f"cost{fi}_{pname}", cp[pname], f["stacked"], ap[pname]
        for f in self._con_fams:
            fi = f["fi"]
            cp, ap = canon.constraints[fi], params.constraints[fi]
            for key in _STRUCT_KEYS[f["structure"][0]]:
                yield f"con{fi}_{key}", cp[key], False, ap[key]

    def param_sig(self, params) -> frozenset:
        """The per-instance signature of `params`: the set of param names
        carrying a trailing batch axis (the `batch_axes` convention).

        Raises Ineligible for layouts the kernel cannot stream (per-knot
        stacked params that are ALSO per-instance, or unexpected ranks) —
        the solver falls back to the XLA scans for those.
        """
        sig = set()
        for name, canon, stacked, leaf in self._iter_params(params):
            nd_c, nd_a = jnp.ndim(canon), jnp.ndim(leaf)
            if nd_a == nd_c + 1:
                if stacked and not self._stacked_full.get(name, False):
                    raise Ineligible(
                        "per-knot AND per-instance cost params on a "
                        "partial knot range"
                    )
                sig.add(name)
            elif nd_a != nd_c:
                raise Ineligible(f"unexpected rank for param {name!r}")
        return frozenset(sig)

    def _pacc(self, get, sig, name):
        """Accessor for a shared-or-per-instance problem param.

        Shared params read SMEM scalars (2-D convention: scalar (1,1),
        vector (k,1), matrix unchanged); per-instance params read
        [sub, lane] tiles from their VMEM block.  Call sites are agnostic:
        `acc(i, j)` / `acc(i)` / `acc()` return something that broadcasts
        against tile arrays either way.
        """
        ref = get(name)
        if name in sig:
            return lambda *idx: ref[idx + (0,)] if idx else ref[0]
        return lambda *idx: (
            ref[idx[0], idx[1]]
            if len(idx) == 2
            else ref[idx[0], 0] if len(idx) == 1 else ref[0, 0]
        )

    # ------------------------------------------------------------- specs
    def _build_specs(self, sig: frozenset):
        """Block specs for one per-instance signature.

        Returns dict(in_specs, names, out_specs, scratch); `_get_call`
        caches the resulting pallas_call per (signature, ...) key.
        """
        n, m, T = self.n, self.m, self.T
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

        def stream(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (T, *dims, 1, self.sub, self.lane),
                lambda b, tb, nd=nd: (tb, *([0] * nd), b, 0, 0),
            )

        def tile(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, 1, self.sub, self.lane),
                lambda b, tb, nd=nd: (*([0] * nd), b, 0, 0),
            )

        specs = []
        names = {}

        def add(name, spec):
            names[name] = len(specs)
            specs.append(spec)

        add("th", smem())  # [N+1, 2] times / steps (row N: t_N, 0)
        for name, shape, stacked in self._param_info:
            if name in sig and stacked:
                # full-range per-knot + per-instance: stage rows stream
                # with the trajectory, terminal row rides its own tile
                add(name, stream(*shape[1:]))
                add(name + "T", tile(*shape[1:]))
            elif name in sig:
                add(name, tile(*shape))
            else:
                add(name, smem())
        add("x0", tile(n))
        add("alpha", tile())
        add("X", stream(n))
        add("U", stream(m))
        add("K", stream(m, n))
        add("d", stream(m))
        for f in self._con_fams:
            fi = f["fi"]
            if f["stage"]:
                add(f"lam{fi}", stream(f["p"]))
                add(f"rho{fi}", stream())
            if f["terminal"]:
                add(f"lamT{fi}", tile(f["p"]))
                add(f"rhoT{fi}", tile())

        out_specs = [
            stream(n),  # Xnext
            stream(m),  # Ubar
            tile(),     # J
            tile(),     # valid
            tile(),     # status
        ]
        scratch = [
            pltpu.VMEM((n, self.sub, self.lane), self.dtype),  # xbar
            pltpu.VMEM((self.sub, self.lane), self.dtype),     # J accumulator
            pltpu.VMEM((self.sub, self.lane), self.dtype),     # J compensation
            pltpu.VMEM((self.sub, self.lane), jnp.int32),      # valid
            pltpu.VMEM((self.sub, self.lane), jnp.int32),      # status
        ]
        return dict(
            in_specs=specs, names=names, out_specs=out_specs, scratch=scratch
        )

    # ------------------------------------------------------------- kernel
    def _tile_dyn_step(self, dyn_params, x, u, t, h):
        f = self._cont_fn
        if self._method == "euler":
            return x + h * f(dyn_params, x, u, t)
        k1 = f(dyn_params, x, u, t)
        k2 = f(dyn_params, x + 0.5 * h * k1, u, t + 0.5 * h)
        k3 = f(dyn_params, x + 0.5 * h * k2, u, t + 0.5 * h)
        k4 = f(dyn_params, x + h * k3, u, t + h)
        return x + h * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

    def _dyn_params_in_kernel(self, get, sig):
        """Unflatten the dynamics param tree from SMEM scalars / VMEM
        tiles.  Vector leaves (canonical rank 1, e.g. inertia [3]) are
        rebuilt with `jnp.stack` over their SMEM rows / per-instance
        tiles — the continuous fn must index them component-wise (the
        shape-polymorphic model convention)."""
        leaves = []
        for i, shape in enumerate(self._dyn_leaf_shapes):
            acc = self._pacc(get, sig, f"dyn{i}")
            if shape == ():
                leaves.append(acc())
            else:
                leaves.append(jnp.stack([acc(j) for j in range(shape[0])]))
        return jax.tree_util.tree_unflatten(self._dyn_treedef, leaves)

    def _cost_acc(self, get, sig, f, pname, blk, flatdim=None):
        """Accessor `(row, *idx)` for one quadratic-cost param.

        Four layouts: shared SMEM scalar, shared per-instance VMEM tile,
        stacked SMEM flattened rows (traced `row` index, `flatdim` = the
        row-major width of 2-D params), and stacked per-instance streamed
        rows (`blk` = static in-block row index; None selects the separate
        terminal-row tile).
        """
        fi = f["fi"]
        name = f"cost{fi}_{pname}"
        if not f["stacked"]:
            a = self._pacc(get, sig, name)
            return lambda row, *idx: a(*idx)
        if name in sig:
            if blk is None:
                ref = get(name + "T")
                return lambda row, *idx: ref[idx + (0,)] if idx else ref[0]
            ref = get(name)
            return lambda row, *idx: ref[(blk,) + idx + (0,)]
        ref = get(name)  # SMEM [nk, flat]

        def rd(row, *idx):
            if len(idx) == 2:
                return ref[row, idx[0] * flatdim + idx[1]]
            if len(idx) == 1:
                return ref[row, idx[0]]
            return ref[row, 0]

        return rd

    def _quad_readers(self, get, sig, f, blk):
        """(Qv, Rv, Hv, qv, rv, cv) accessors for one quadratic cost family,
        each taking a leading `row` argument (used by the stacked-SMEM
        layout; the others ignore it — see `_cost_acc`)."""
        n, m = self.n, self.m
        return (
            self._cost_acc(get, sig, f, "Q", blk, n),
            self._cost_acc(get, sig, f, "R", blk, m),
            self._cost_acc(get, sig, f, "H", blk, m),
            self._cost_acc(get, sig, f, "q", blk),
            self._cost_acc(get, sig, f, "r", blk),
            self._cost_acc(get, sig, f, "c", blk),
        )

    def _tile_quad(self, get, sig, f, x, u, row, blk):
        """Quadratic cost on a tile (scalar/tile-param unroll)."""
        n, m = self.n, self.m
        Qv_, Rv_, Hv_, qv_, rv_, cv_ = self._quad_readers(get, sig, f, blk)
        Qv = lambda i, j: Qv_(row, i, j)
        Rv = lambda i, j: Rv_(row, i, j)
        Hv = lambda i, j: Hv_(row, i, j)
        qv = lambda i: qv_(row, i)
        rv = lambda i: rv_(row, i)
        J = cv_(row) + jnp.zeros_like(x[0])
        for i in range(n):
            J += qv(i) * x[i]
            J += 0.5 * Qv(i, i) * x[i] * x[i]
            for j in range(i + 1, n):  # symmetric off-diagonals
                J += Qv(i, j) * x[i] * x[j]
        if u is not None:
            for i in range(m):
                J += rv(i) * u[i]
                J += 0.5 * Rv(i, i) * u[i] * u[i]
                for j in range(i + 1, m):
                    J += Rv(i, j) * u[i] * u[j]
            for i in range(n):
                for j in range(m):
                    J += Hv(i, j) * x[i] * u[j]
        return J

    @staticmethod
    def _comp_circle(dx, dy, r):
        """r² − dx² − dy² in compensated (double-f32) arithmetic, collapsed
        to a correctly-rounded f32.

        The plain f32 expression carries ~ε·O(r²) ABSOLUTE error from the
        cancelling squares; the AL machinery multiplies c by penalties up
        to 1e8 (`constraint_values.hpp:131-143`), so that floor becomes
        O(1) noise in the gradient and dual update — the measured cause of
        the obstacle fleets' f32 MAX_PENALTY residue
        (perf/obstacle_f32_floor.out).  Dekker-split squares + compensated
        summation make the error RELATIVE (~ε·|c|), which the penalty
        scaling cannot amplify.  ~20 extra VPU ops per obstacle row.
        """
        split = 4097.0  # 2^12 + 1 (f32 Dekker split constant)

        def two_sq(a):
            t = a * split
            hi = t - (t - a)
            lo = a - hi
            sq = a * a
            err = ((hi * hi - sq) + 2.0 * hi * lo) + lo * lo
            return sq, err

        def two_diff(a, b):
            s = a - b
            bb = s - a
            err = (a - (s - bb)) - (b + bb)
            return s, err

        r2, r2e = two_sq(r + jnp.zeros_like(dx))
        x2, x2e = two_sq(dx)
        y2, y2e = two_sq(dy)
        s1, e1 = two_diff(r2, x2)
        s2, e2 = two_diff(s1, y2)
        return s2 + (((r2e - x2e) - y2e) + e1 + e2)

    def _tile_con_rows(self, get, sig, f, x, u):
        """Constraint rows [p] of [self.sub,self.lane] arrays for one family."""
        fi = f["fi"]
        kind = f["structure"][0]
        if kind == "goal":
            xf = self._pacc(get, sig, f"con{fi}_xf")
            return [x[i] - xf(i) for i in range(self.n)]
        if kind == "control_bound":
            _, lo_idx, hi_idx = f["structure"]
            lb = self._pacc(get, sig, f"con{fi}_lb")
            ub = self._pacc(get, sig, f"con{fi}_ub")
            rows = [lb(j) - u[j] for j in lo_idx]
            rows += [u[j] - ub(j) for j in hi_idx]
            return rows
        # circle — compensated evaluation, see _comp_circle
        _, xi, yi = f["structure"]
        cx = self._pacc(get, sig, f"con{fi}_cx")
        cy = self._pacc(get, sig, f"con{fi}_cy")
        rr = self._pacc(get, sig, f"con{fi}_r")
        rows = []
        for o in range(f["p"]):
            dx = x[xi] - cx(o)
            dy = x[yi] - cy(o)
            rows.append(self._comp_circle(dx, dy, rr(o)))
        return rows

    @staticmethod
    def _al_value(cone, lam_rows, rho, c_rows):
        """(‖Π(λ−ρc)‖² − ‖λ‖²)/2ρ on tiles (`constraint_values.hpp:111-119`)."""
        acc = None
        lam2 = None
        for lam, c in zip(lam_rows, c_rows):
            s = lam - rho * c
            proj = s if cone is Cone.ZERO else jnp.minimum(s, 0.0)
            term = proj * proj
            acc = term if acc is None else acc + term
            l2 = lam * lam
            lam2 = l2 if lam2 is None else lam2 + l2
        return (acc - lam2) / (2.0 * rho)

    def _make_kernel(self, check_bounds: bool, sig: frozenset, names, n_in):
        n, m, T, NT, N = self.n, self.m, self.T, self.NT, self.N
        opts = self.opts
        cost_fams = self._cost_fams
        con_fams = self._con_fams
        state_max2 = float(opts.state_max) ** 2
        control_max2 = float(opts.control_max) ** 2

        def kernel(*refs):
            in_refs = refs[:n_in]
            xn_ref, ub_ref, J_ref, valid_ref, status_ref = refs[n_in : n_in + 5]
            xbar_scr, J_scr, comp_scr, valid_scr, status_scr = refs[n_in + 5 :]

            def get(name):
                return in_refs[names[name]]

            tb = pl.program_id(1)

            @pl.when(tb == 0)
            def _init():
                xbar_scr[...] = get("x0")[:, 0]
                J_scr[...] = jnp.zeros(J_scr.shape, J_scr.dtype)
                comp_scr[...] = jnp.zeros(comp_scr.shape, comp_scr.dtype)
                valid_scr[...] = jnp.ones(valid_scr.shape, valid_scr.dtype)
                status_scr[...] = jnp.full(
                    status_scr.shape, _UNSOLVED, status_scr.dtype
                )

            dyn_params = self._dyn_params_in_kernel(get, sig)
            th = get("th")
            alpha = get("alpha")[0]

            x = xbar_scr[...]
            # Kahan-compensated cost accumulation: the N-term sequential f32
            # sum would otherwise be noisier than XLA's tree reduction, and
            # line-search acceptance compares J0 - J, a tiny difference of
            # large numbers (`ilqr.hpp:528-542`).
            J = J_scr[...]
            comp = comp_scr[...]
            valid = valid_scr[...] > 0
            status = status_scr[...]

            def kadd(J, comp, term):
                y = term - comp
                t = J + y
                comp = (t - J) - y
                return t, comp

            for i in range(T):
                k = tb * T + i  # traced knot index
                t_k = th[k, 0]
                h_k = th[k, 1]
                Xrow = get("X")[i, :, 0]
                Urow = get("U")[i, :, 0]
                Krow = get("K")[i, :, :, 0]
                drow = get("d")[i, :, 0]

                dx = x - Xrow
                ubar = Urow + (Krow * dx[None, :]).sum(axis=1) + alpha * drow

                # stage cost: quadratic families active at knot k
                for f in cost_fams:
                    if f["k0"] > N - 1:
                        continue
                    nk = f["k1"] - f["k0"] + 1
                    row = jnp.clip(k - f["k0"], 0, nk - 1)
                    Jc = self._tile_quad(get, sig, f, x, ubar, row, i)
                    lo, hi = f["k0"], min(f["k1"], N - 1)
                    if not (lo == 0 and hi == N - 1):
                        inr = (k >= lo) & (k <= hi)
                        Jc = jnp.where(inr, Jc, 0.0)
                    J, comp = kadd(J, comp, Jc)

                # AL penalty terms of stage constraint families
                for f in con_fams:
                    if not f["stage"]:
                        continue
                    fi = f["fi"]
                    lam_rows = [
                        get(f"lam{fi}")[i, r, 0] for r in range(f["p"])
                    ]
                    rho = get(f"rho{fi}")[i, 0]
                    c_rows = self._tile_con_rows(get, sig, f, x, ubar)
                    Jc = self._al_value(f["cone"], lam_rows, rho, c_rows)
                    lo, hi = f["k0"], min(f["k1"], N - 1)
                    if not (lo == 0 and hi == N - 1):
                        inr = (k >= lo) & (k <= hi)
                        Jc = jnp.where(inr, Jc, 0.0)
                    J, comp = kadd(J, comp, Jc)

                xnext = self._tile_dyn_step(dyn_params, x, ubar, t_k, h_k)

                if check_bounds:
                    xn2 = (xnext * xnext).sum(axis=0)
                    un2 = (ubar * ubar).sum(axis=0)
                    state_ok = xn2 <= state_max2
                    ctrl_ok = un2 <= control_max2
                    step_ok = state_ok & ctrl_ok
                    fail_now = valid & ~step_ok
                    status = jnp.where(
                        fail_now,
                        jnp.where(~state_ok, _STATE_LIMIT, _CONTROL_LIMIT),
                        status,
                    )
                    valid = valid & step_ok
                    x = jnp.where(valid[None, :, :], xnext, x)
                else:
                    x = xnext

                xn_ref[i, :, 0] = x
                ub_ref[i, :, 0] = ubar

            xbar_scr[...] = x
            J_scr[...] = J
            comp_scr[...] = comp
            valid_scr[...] = valid.astype(valid_scr.dtype)
            status_scr[...] = status

            @pl.when(tb == NT - 1)
            def _finalize():
                xN = xbar_scr[...]
                Jf = J_scr[...]
                compf = comp_scr[...]
                for f in cost_fams:
                    if f["k1"] == N:
                        Jf, compf = kadd(
                            Jf, compf,
                            self._tile_quad(
                                get, sig, f, xN, None, N - f["k0"], None
                            ),
                        )
                for f in con_fams:
                    if not f["terminal"]:
                        continue
                    fi = f["fi"]
                    lam_rows = [
                        get(f"lamT{fi}")[r, 0] for r in range(f["p"])
                    ]
                    rho = get(f"rhoT{fi}")[0]
                    um = None
                    if f["structure"][0] == "control_bound":
                        um = [jnp.zeros_like(xN[0])] * m
                    c_rows = self._tile_con_rows(get, sig, f, xN, um)
                    Jf, compf = kadd(
                        Jf, compf,
                        self._al_value(f["cone"], lam_rows, rho, c_rows),
                    )
                J_ref[0] = Jf - compf
                valid_ref[0] = valid_scr[...]
                status_ref[0] = status_scr[...]

        return kernel

    def _get_call(self, check_bounds: bool, nt: int, sig: frozenset):
        key = (check_bounds, nt, sig)
        if key not in self._kernels:
            n, m, N = self.n, self.m, self.N
            sp = self._build_specs(sig)
            out_shape = [
                jax.ShapeDtypeStruct((N, n, nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((N, m, nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), jnp.int32),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), jnp.int32),
            ]
            self._kernels[key] = pl.pallas_call(
                self._make_kernel(
                    check_bounds, sig, sp["names"], len(sp["in_specs"])
                ),
                grid=(nt, self.NT),
                in_specs=sp["in_specs"],
                out_specs=sp["out_specs"],
                out_shape=out_shape,
                scratch_shapes=sp["scratch"],
                interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
            )
        return self._kernels[key]

    # ------------------------------------------------------------- call
    def pad_al(self, al):
        """Pad per-family AL state to full stage/terminal buffers.

        Returns a list aligned with `self._con_fams` of dicts with
        `lam` [N,p,B] / `rho` [N,B] (stage, zero/one padded) and
        `lamT` [p,B] / `rhoT` [B] (terminal).  Call once per inner solve —
        duals and penalties are constant within it.
        """
        N = self.N
        out = []
        for f, st in zip(self._con_fams, al):
            lam, rho = st["lam"], st["rho"]
            B = rho.shape[-1]
            d = {}
            if f["stage"]:
                hi = min(f["k1"], N - 1)
                nk_stage = hi - f["k0"] + 1
                lam_s = jnp.zeros((N, f["p"], B), lam.dtype)
                rho_s = jnp.ones((N, B), rho.dtype)
                lam_s = lam_s.at[f["k0"] : hi + 1].set(lam[:nk_stage])
                rho_s = rho_s.at[f["k0"] : hi + 1].set(rho[:nk_stage])
                d["lam"] = lam_s
                d["rho"] = rho_s
            if f["terminal"]:
                d["lamT"] = lam[-1]
                d["rhoT"] = rho[-1]
            out.append(d)
        return out

    def _param_arrays(self, params, sig: frozenset, shp, smem2):
        """Problem-param input arrays in `_param_info` order for one call."""
        f32 = self.dtype
        arrays = []
        for name, canon, stacked, leaf in self._iter_params(params):
            if name in sig and stacked:
                # full-range [N+1, core..., B]: stage rows stream, terminal
                # row rides its own tile (specs add name then name+"T")
                a = jnp.asarray(leaf, f32)
                arrays.append(shp(a[: self.N]))
                arrays.append(shp(a[self.N]))
            elif name in sig:
                arrays.append(shp(jnp.asarray(leaf, f32)))
            elif stacked:
                a = jnp.asarray(leaf, f32)
                arrays.append(a.reshape(a.shape[0], -1))  # [nk, flat]
            else:
                arrays.append(smem2(leaf))
        return arrays

    def __call__(self, params, al_pad, Z, K, d, alpha, *, check_bounds=True):
        n, m, N = self.n, self.m, self.N
        B = Z.X.shape[-1]
        if B % self.tile != 0:
            raise ValueError(f"batch {B} must be a multiple of {self.tile}")
        nt = B // self.tile
        f32 = self.dtype
        sig = self.param_sig(params)

        def shp(x):  # split batch into (nt, self.sub, self.lane)
            return jnp.asarray(x, f32).reshape(x.shape[:-1] + (nt, self.sub, self.lane))

        def smem2(x):
            a = jnp.asarray(x, f32)
            if a.ndim == 0:
                return a.reshape(1, 1)
            if a.ndim == 1:
                return a.reshape(-1, 1)
            return a

        th = jnp.stack(
            [Z.t, jnp.concatenate([Z.h, jnp.zeros((1,), Z.h.dtype)])], axis=-1
        )
        arrays = [smem2(th)]
        arrays += self._param_arrays(params, sig, shp, smem2)
        x0 = params.x0
        if x0.ndim == 1:
            x0 = jnp.broadcast_to(x0[:, None], (n, B))
        arrays.append(shp(x0))
        alpha = jnp.asarray(alpha, f32)
        if alpha.ndim == 0:
            alpha = jnp.broadcast_to(alpha, (B,))
        arrays.append(shp(alpha))
        arrays += [shp(Z.X[:-1]), shp(Z.U), shp(K), shp(d)]
        for f, pad in zip(self._con_fams, al_pad):
            if f["stage"]:
                arrays.append(shp(pad["lam"]))
                arrays.append(shp(pad["rho"]))
            if f["terminal"]:
                arrays.append(shp(pad["lamT"]))
                arrays.append(shp(pad["rhoT"]))

        call = self._get_call(check_bounds, nt, sig)
        Xn, Ubar, J, valid, status = call(*arrays)

        def unshp(x):
            return x.reshape(x.shape[:-3] + (B,))

        return (
            unshp(Xn),
            unshp(Ubar),
            unshp(J),
            unshp(valid) > 0,
            unshp(status),
        )


def build_forward_kernel(
    prob, opts, *, interpret: bool = False, dtype=jnp.float32, sub: int = SUB
):
    """Build the fused kernel, or return None if the problem is ineligible."""
    try:
        return ForwardKernel(prob, opts, interpret=interpret, dtype=dtype, sub=sub)
    except Ineligible:
        return None
