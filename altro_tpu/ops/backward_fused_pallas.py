"""Fused Pallas TPU kernel: expansions + Riccati backward sweep in one pass.

Round-2 profile: with the forward pass and the Riccati sweep fused
(`ops/forward_pallas.py`, `ops/riccati_pallas.py`), the remaining
multi-kernel XLA phase is `ALSolverBatched.expand` — per-family cost/AL
expansion gathers + double-vmapped RK4 Jacobians that materialize
~40 tile-arrays per knot (`lx, lu, lxx, lxu, luu, A, B`: ≈65 MB at B=4096,
N=100, f32) to HBM, which the backward sweep immediately streams back in.
The reference's own profile shows the same split: expansions are 31-35% of
its solve (`perf/profiler_unicycle.out:10`).

This kernel computes the expansions ON THE FLY inside the backward sweep:
at grid step k it streams only (x_k, u_k, λ_k, ρ_k) HBM→VMEM (≈10 tiles
instead of ≈40), rebuilds the quadratic-cost expansion from SMEM scalars
(or VMEM tiles for per-instance params — see `ForwardKernel.param_sig`),
assembles the AL Gauss-Newton terms from the structured constraints
(`constraint_values.hpp:131-177` algebra, diagonal cones), differentiates
the RK4/Euler step via `jax.linearize` of the continuous dynamics
(`integration.hpp:132-169` chain rule), and runs the Riccati recursion with
the cost-to-go carry resident in VMEM (`ilqr.hpp:385-445`).  It also
Kahan-accumulates the trajectory's AL cost, so the caller gets J0 for free
and the separate cost pass disappears.

Eligibility matches `ForwardKernel` (quadratic costs, structured
constraints, shared-structure rk4/euler dynamics with scalar params, zero /
negative-orthant cones, batch % 1024 == 0); per-instance (trailing-batch)
cost / constraint / dynamics param leaves stream as VMEM tiles, variants
cached per signature.  The solver falls back to `expand` +
`riccati_pallas`/`riccati_scan` otherwise.

Semantics equal `expand` + `riccati_scan` (verified in interpret mode by
tests/test_backward_fused.py and compiled-on-TPU by
perf/verify_kernels.py / tests/test_tpu_compiled.py).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..problem.constraints import Cone
from .forward_pallas import ForwardKernel, Ineligible, _pick_T
from .riccati_pallas import LANE, SUB, TILE, _chol, _chol_solve_mat, _mT, _mm, _mv


class BackwardFusedKernel(ForwardKernel):
    """Fused expansion + Riccati backward kernel for one problem.

    `__call__(params, al_pad, Z, rho)` returns
    `(K [N,m,n,B], d [N,m,B], dV1 [B], dV2 [B], failed [B], J0 [B])` equal to
    `expand` + `riccati_scan` (+ per-knot cost sum) to f32 rounding.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # Multi-knot time blocks (r5): stream Tb knots per grid step and
        # unroll the recursion over them with the cost-to-go carry in
        # registers — N/Tb sequential grid steps instead of N, same
        # streamed bytes.  Measured worth ~10-25% (with the wide tiles);
        # the body itself is VPU-instruction-bound, so fewer grid steps
        # only shave the per-step overhead (perf/roofline.out r5 note).
        n, m = self.n, self.m
        sum_p = sum(f["p"] + 1 for f in self._con_fams if f["stage"])
        per_step = (n + m + sum_p + m * n + m) * self.tile * 4
        # cap 10: the backward body (RK4 Jacobian + Cholesky + Riccati) is
        # ~5x the forward body, so deeper unrolls cost compile time and
        # register pressure for no further latency win
        self.Tb = _pick_T(self.N, per_step, cap=10)
        self.NTB = self.N // self.Tb

    def _build_specs(self, sig: frozenset):
        n, m = self.n, self.m
        N = self.N
        Tb, NTB = self.Tb, self.NTB
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

        # time iterates REVERSED in blocks of Tb knots per grid call (the
        # Riccati carry is sequential; Pallas still double-buffers block
        # kb+1's streams while block kb computes)
        def rstream(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (Tb, *dims, 1, self.sub, self.lane),
                lambda b, kb, nd=nd: (NTB - 1 - kb, *([0] * nd), b, 0, 0),
            )

        def tile(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, 1, self.sub, self.lane),
                lambda b, k, nd=nd: (*([0] * nd), b, 0, 0),
            )

        specs = []
        names = {}

        def add(name, spec):
            names[name] = len(specs)
            specs.append(spec)

        add("th", smem())
        for name, shape, stacked in self._param_info:
            if name in sig and stacked:
                # full-range per-knot + per-instance: stage rows stream
                # reversed with the trajectory, terminal row on its own tile
                add(name, rstream(*shape[1:]))
                add(name + "T", tile(*shape[1:]))
            elif name in sig:
                add(name, tile(*shape))
            else:
                add(name, smem())
        add("X", rstream(n))
        add("U", rstream(m))
        add("xN", tile(n))
        add("rho_reg", tile())
        for f in self._con_fams:
            fi = f["fi"]
            if f["stage"]:
                add(f"lam{fi}", rstream(f["p"]))
                add(f"rho{fi}", rstream())
            if f["terminal"]:
                add(f"lamT{fi}", tile(f["p"]))
                add(f"rhoT{fi}", tile())

        out_specs = [
            rstream(m, n),  # K
            rstream(m),     # d
            tile(),         # dV1
            tile(),         # dV2
            tile(),         # failed
            tile(),         # J0
        ]
        scratch = [
            pltpu.VMEM((n, n, self.sub, self.lane), self.dtype),  # P
            pltpu.VMEM((n, self.sub, self.lane), self.dtype),     # p
            pltpu.VMEM((2, self.sub, self.lane), self.dtype),     # dV1, dV2
            pltpu.VMEM((self.sub, self.lane), jnp.int32),         # failed
            pltpu.VMEM((2, self.sub, self.lane), self.dtype),     # J, comp
        ]
        return dict(
            in_specs=specs, names=names, out_specs=out_specs, scratch=scratch
        )

    # ------------------------------------------------------- tile expansions
    def _tile_quad_expansion(self, get, sig, f, x, u, row, blk):
        """Quadratic-cost expansion on a tile: value J, gradient rows
        (lx [n], lu [m]) and the constant Hessian entries as accessors
        (Qv/Hv/Rv) for direct accumulation (`quadratic_cost.cpp:8-63`)."""
        n, m = self.n, self.m
        Qv_, Rv_, Hv_, qv_, rv_, _ = self._quad_readers(get, sig, f, blk)
        Qv = lambda i, j: Qv_(row, i, j)
        Rv = lambda i, j: Rv_(row, i, j)
        Hv = lambda i, j: Hv_(row, i, j)
        qv = lambda i: qv_(row, i)
        rv = lambda i: rv_(row, i)
        J = self._tile_quad(get, sig, f, x, u, row, blk)
        lx = []
        for i in range(n):
            acc = qv(i) + Qv(i, i) * x[i]
            for j in range(n):
                if j != i:
                    acc += Qv(min(i, j), max(i, j)) * x[j]
            if u is not None:
                for j in range(m):
                    acc += Hv(i, j) * u[j]
            lx.append(acc)
        lu = None
        if u is not None:
            lu = []
            for i in range(m):
                acc = rv(i) + Rv(i, i) * u[i]
                for j in range(m):
                    if j != i:
                        acc += Rv(min(i, j), max(i, j)) * u[j]
                for j in range(n):
                    acc += Hv(j, i) * x[j]
                lu.append(acc)
        return J, lx, lu, Qv, Hv, Rv

    def _tile_al_expansion(self, get, sig, f, x, u, lam_rows, rho):
        """AL value + gradient/Gauss-Newton contributions for one structured
        constraint family on a tile (`constraint_values.hpp:111-177`).

        Returns (J, gx [n], gu [m], Hxx [n][n], Hxu [n][m], Huu [m][m]) as
        accumulation lists (None entries = structurally zero).
        """
        n, m = self.n, self.m
        c_rows = self._tile_con_rows(get, sig, f, x, u)
        J = self._al_value(f["cone"], lam_rows, rho, c_rows)
        zero = jnp.zeros_like(x[0])
        gx = [zero] * n
        gu = [zero] * m
        Hxx = [[zero] * n for _ in range(n)]
        Hxu = [[zero] * m for _ in range(n)]
        Huu = [[zero] * m for _ in range(m)]
        kind = f["structure"][0]
        for r, (lam, c) in enumerate(zip(lam_rows, c_rows)):
            s = lam - rho * c
            if f["cone"] is Cone.ZERO:  # dual IDENTITY: Π = id
                proj = s
                dp = jnp.ones_like(s)
            else:  # NEGATIVE_ORTHANT is self-dual
                proj = jnp.minimum(s, 0.0)
                dp = jnp.where(s <= 0.0, 1.0, 0.0).astype(s.dtype)
            # gradient = -Σ_r dp_r · C[r,:] · proj_r; Hessian (GN) =
            # ρ Σ_r dp_r · C[r,:]ᵀC[r,:] (dp² = dp for 0/1 masks)
            w = dp * proj
            hw = rho * dp
            if kind == "goal":
                gx[r] = gx[r] - w
                Hxx[r][r] = Hxx[r][r] + hw
            elif kind == "control_bound":
                _, lo_idx, hi_idx = f["structure"]
                if r < len(lo_idx):  # c = lb - u_j, C_u[r, j] = -1
                    j = lo_idx[r]
                    gu[j] = gu[j] + w
                    Huu[j][j] = Huu[j][j] + hw
                else:  # c = u_j - ub, C_u[r, j] = +1
                    j = hi_idx[r - len(lo_idx)]
                    gu[j] = gu[j] - w
                    Huu[j][j] = Huu[j][j] + hw
            else:  # circle: c = r² - dx² - dy²; C_x = (-2dx, -2dy)
                _, xi, yi = f["structure"]
                cx = self._pacc(get, sig, f"con{f['fi']}_cx")
                cy = self._pacc(get, sig, f"con{f['fi']}_cy")
                dx = x[xi] - cx(r)
                dy = x[yi] - cy(r)
                gx[xi] = gx[xi] + 2.0 * dx * w
                gx[yi] = gx[yi] + 2.0 * dy * w
                Hxx[xi][xi] = Hxx[xi][xi] + 4.0 * hw * dx * dx
                Hxx[yi][yi] = Hxx[yi][yi] + 4.0 * hw * dy * dy
                hxy = 4.0 * hw * dx * dy
                Hxx[min(xi, yi)][max(xi, yi)] = (
                    Hxx[min(xi, yi)][max(xi, yi)] + hxy
                )
                Hxx[max(xi, yi)][min(xi, yi)] = (
                    Hxx[max(xi, yi)][min(xi, yi)] + hxy
                )
        return J, gx, gu, Hxx, Hxu, Huu

    def _tile_dyn_jacobian(self, dyn_params, x, u, t, h):
        """Discrete A [n,n,·], B [n,m,·] of the rk4/euler step on a tile —
        the hand chain rule of `integration.hpp:132-169`, with the
        continuous Jacobians taken by `jax.linearize` columns."""
        n, m = self.n, self.m
        f = self._cont_fn
        one = jnp.ones_like(x[0])
        zero = jnp.zeros_like(x[0])

        def basis(dim, j):
            return jnp.stack([one if i == j else zero for i in range(dim)])

        zx = jnp.stack([zero] * n)
        zu = jnp.stack([zero] * m)

        def cont_jac(x_pt, t_pt):
            _, lin = jax.linearize(
                lambda xx, uu: f(dyn_params, xx, uu, t_pt), x_pt, u
            )
            Ac = jnp.stack([lin(basis(n, j), zu) for j in range(n)], axis=1)
            Bc = jnp.stack([lin(zx, basis(m, j)) for j in range(m)], axis=1)
            return Ac, Bc

        if self._method == "euler":
            Ac, Bc = cont_jac(x, t)
            eye = jnp.stack(
                [jnp.stack([one if i == j else zero for j in range(n)])
                 for i in range(n)]
            )
            return eye + h * Ac, h * Bc

        k1 = f(dyn_params, x, u, t)
        x2 = x + 0.5 * h * k1
        k2 = f(dyn_params, x2, u, t + 0.5 * h)
        x3 = x + 0.5 * h * k2
        k3 = f(dyn_params, x3, u, t + 0.5 * h)
        x4 = x + h * k3
        A1, B1 = cont_jac(x, t)
        A2, B2 = cont_jac(x2, t + 0.5 * h)
        A3, B3 = cont_jac(x3, t + 0.5 * h)
        A4, B4 = cont_jac(x4, t + h)
        eye = jnp.stack(
            [jnp.stack([one if i == j else zero for j in range(n)])
             for i in range(n)]
        )
        dA1 = h * A1
        dA2 = h * _mm(A2, eye + 0.5 * dA1)
        dA3 = h * _mm(A3, eye + 0.5 * dA2)
        dA4 = h * _mm(A4, eye + dA3)
        A = eye + (dA1 + 2.0 * dA2 + 2.0 * dA3 + dA4) / 6.0
        dB1 = h * B1
        dB2 = h * B2 + 0.5 * h * _mm(A2, dB1)
        dB3 = h * B3 + 0.5 * h * _mm(A3, dB2)
        dB4 = h * B4 + h * _mm(A4, dB3)
        Bd = (dB1 + 2.0 * dB2 + 2.0 * dB3 + dB4) / 6.0
        return A, Bd

    # --------------------------------------------------------------- kernel
    def _make_kernel(self, sig: frozenset, names, n_in):
        n, m, N = self.n, self.m, self.N
        cost_fams = self._cost_fams
        con_fams = self._con_fams

        Tb, NTB = self.Tb, self.NTB

        def kernel(*refs):
            in_refs = refs[:n_in]
            K_ref, d_ref, dV1_ref, dV2_ref, failed_ref, J0_ref = refs[
                n_in : n_in + 6
            ]
            P_scr, p_scr, dv_scr, fail_scr, J_scr = refs[n_in + 6 :]

            def get(name):
                return in_refs[names[name]]

            kb = pl.program_id(1)
            th = get("th")
            dyn_params = self._dyn_params_in_kernel(get, sig)

            def kadd(J, comp, term):
                y = term - comp
                t = J + y
                comp = (t - J) - y
                return t, comp

            @pl.when(kb == 0)
            def _init():
                # terminal expansion -> P_N, p_N (+ terminal cost into J)
                xN = get("xN")[:, 0]
                xs = [xN[i] for i in range(n)]
                zero = jnp.zeros_like(xN[0])
                J = zero
                comp = zero
                lxT = [zero] * n
                lxxT = [[zero] * n for _ in range(n)]
                for f in cost_fams:
                    if f["k1"] != N:
                        continue
                    row = N - f["k0"]
                    Jq, lx, _, Qv, _, _ = self._tile_quad_expansion(
                        get, sig, f, xs, None, row, None
                    )
                    J, comp = kadd(J, comp, Jq)
                    for i in range(n):
                        lxT[i] = lxT[i] + lx[i]
                        for j in range(n):
                            lxxT[i][j] = lxxT[i][j] + Qv(
                                min(i, j), max(i, j)
                            ) * jnp.ones_like(zero)
                for f in con_fams:
                    if not f["terminal"]:
                        continue
                    fi = f["fi"]
                    lam_rows = [get(f"lamT{fi}")[r, 0] for r in range(f["p"])]
                    rho_c = get(f"rhoT{fi}")[0]
                    um = None
                    if f["structure"][0] == "control_bound":
                        um = [zero] * m
                    Jc, gx, _, Hxx, _, _ = self._tile_al_expansion(
                        get, sig, f, xs, um, lam_rows, rho_c
                    )
                    J, comp = kadd(J, comp, Jc)
                    for i in range(n):
                        lxT[i] = lxT[i] + gx[i]
                        for j in range(n):
                            lxxT[i][j] = lxxT[i][j] + Hxx[i][j]
                P_scr[...] = jnp.stack([jnp.stack(row) for row in lxxT])
                p_scr[...] = jnp.stack(lxT)
                dv_scr[...] = jnp.zeros(dv_scr.shape, dv_scr.dtype)
                fail_scr[...] = jnp.zeros(fail_scr.shape, fail_scr.dtype)
                J_scr[0] = J
                J_scr[1] = comp

            # ---------------- carries in registers across the Tb knots
            rho = get("rho_reg")[0]
            glim = float(self.opts.bp_gain_limit)
            P = P_scr[...]
            p = p_scr[...]
            dv1 = dv_scr[0]
            dv2 = dv_scr[1]
            failed = fail_scr[...] > 0
            J = J_scr[0]
            comp = J_scr[1]
            base = (NTB - 1 - kb) * Tb  # first knot of this time block

            for blk in reversed(range(Tb)):
                # ------------ expansion at knot k (streamed reversed)
                x = get("X")[blk, :, 0]
                u = get("U")[blk, :, 0]
                xs = [x[i] for i in range(n)]
                us = [u[i] for i in range(m)]
                k = base + blk
                t_k = th[k, 0]
                h_k = th[k, 1]
                zero = jnp.zeros_like(x[0])
                lx = [zero] * n
                lu = [zero] * m
                lxx = [[zero] * n for _ in range(n)]
                lxu = [[zero] * m for _ in range(n)]
                luu = [[zero] * m for _ in range(m)]
                for f in cost_fams:
                    if f["k0"] > N - 1:
                        continue
                    nk = f["k1"] - f["k0"] + 1
                    row = jnp.clip(k - f["k0"], 0, nk - 1)
                    Jq, glx, glu, Qv, Hv, Rv = self._tile_quad_expansion(
                        get, sig, f, xs, us, row, blk
                    )
                    lo, hi = f["k0"], min(f["k1"], N - 1)
                    inr = None
                    if not (lo == 0 and hi == N - 1):
                        inr = (k >= lo) & (k <= hi)
                        Jq = jnp.where(inr, Jq, 0.0)
                    J, comp = kadd(J, comp, Jq)
                    gate = (
                        (lambda v: jnp.where(inr, v, 0.0))
                        if inr is not None
                        else (lambda v: v)
                    )
                    for i in range(n):
                        lx[i] = lx[i] + gate(glx[i])
                        for j in range(n):
                            lxx[i][j] = lxx[i][j] + gate(
                                Qv(min(i, j), max(i, j)) + zero
                            )
                        for j in range(m):
                            lxu[i][j] = lxu[i][j] + gate(Hv(i, j) + zero)
                    for i in range(m):
                        lu[i] = lu[i] + gate(glu[i])
                        for j in range(m):
                            luu[i][j] = luu[i][j] + gate(
                                Rv(min(i, j), max(i, j)) + zero
                            )
                for f in con_fams:
                    if not f["stage"]:
                        continue
                    fi = f["fi"]
                    lam_rows = [
                        get(f"lam{fi}")[blk, r, 0] for r in range(f["p"])
                    ]
                    rho_c = get(f"rho{fi}")[blk, 0]
                    Jc, gx, gu, Hxx, Hxu, Huu = self._tile_al_expansion(
                        get, sig, f, xs, us, lam_rows, rho_c
                    )
                    lo, hi = f["k0"], min(f["k1"], N - 1)
                    inr = None
                    if not (lo == 0 and hi == N - 1):
                        inr = (k >= lo) & (k <= hi)
                        Jc = jnp.where(inr, Jc, 0.0)
                    J, comp = kadd(J, comp, Jc)
                    gate = (
                        (lambda v: jnp.where(inr, v, 0.0))
                        if inr is not None
                        else (lambda v: v)
                    )
                    for i in range(n):
                        lx[i] = lx[i] + gate(gx[i])
                        for j in range(n):
                            lxx[i][j] = lxx[i][j] + gate(Hxx[i][j])
                        for j in range(m):
                            lxu[i][j] = lxu[i][j] + gate(Hxu[i][j])
                    for i in range(m):
                        lu[i] = lu[i] + gate(gu[i])
                        for j in range(m):
                            luu[i][j] = luu[i][j] + gate(Huu[i][j])

                A, Bd = self._tile_dyn_jacobian(dyn_params, x, u, t_k, h_k)
                lx_s = jnp.stack(lx)
                lu_s = jnp.stack(lu)
                lxx_s = jnp.stack([jnp.stack(r) for r in lxx])
                lxu_s = jnp.stack([jnp.stack(r) for r in lxu])
                luu_s = jnp.stack([jnp.stack(r) for r in luu])

                # ------------ Riccati step (`riccati_pallas._kernel`)
                At = _mT(A)
                AtP = _mm(At, P)
                Qxx = lxx_s + _mm(AtP, A)
                Qxu = lxu_s + _mm(AtP, Bd)
                Quu = luu_s + _mm(_mT(Bd), _mm(P, Bd))
                Qx = lx_s + _mv(At, p)
                Qu = lu_s + _mv(_mT(Bd), p)

                L, fail_k = _chol(Quu, diag_add=rho)
                K = -_chol_solve_mat(L, _mT(Qxu))
                d = -_chol_solve_mat(L, Qu[:, None])[:, 0]
                # gain-magnitude guard (SolverOptions.bp_gain_limit)
                fail_k = fail_k | jnp.logical_not(
                    (jnp.max(jnp.abs(K), axis=(0, 1)) <= glim)
                    & (jnp.max(jnp.abs(d), axis=0) <= glim)
                )

                KtQuu = _mm(_mT(K), Quu)
                p_new = Qx + _mv(KtQuu, d) + _mv(_mT(K), Qu) + _mv(Qxu, d)
                # KᵀQxuᵀ = (QxuK)ᵀ with identical per-term products and
                # summation order — reuse the transpose, saving one n×n
                # multiply per knot (bitwise identical)
                QK = _mm(Qxu, K)
                P_new = Qxx + _mm(KtQuu, K) + _mT(QK) + QK
                dV1_new = (d * Qu).sum(axis=0)
                dV2_new = 0.5 * (d * _mv(Quu, d)).sum(axis=0)

                now_failed = failed | fail_k
                keep = ~now_failed
                P = jnp.where(keep[None, None], P_new, P)
                p = jnp.where(keep[None], p_new, p)
                dv1 = jnp.where(keep, dv1 + dV1_new, dv1)
                dv2 = jnp.where(keep, dv2 + dV2_new, dv2)
                failed = now_failed

                K_ref[blk, :, :, 0] = K
                d_ref[blk, :, 0] = d

            P_scr[...] = P
            p_scr[...] = p
            dv_scr[0] = dv1
            dv_scr[1] = dv2
            fail_scr[...] = failed.astype(fail_scr.dtype)
            J_scr[0] = J
            J_scr[1] = comp

            @pl.when(kb == NTB - 1)
            def _finalize():
                dV1_ref[0] = dv_scr[0]
                dV2_ref[0] = dv_scr[1]
                failed_ref[0] = fail_scr[...]
                J0_ref[0] = J_scr[0] - J_scr[1]

        return kernel

    def _get_call(self, nt: int, sig: frozenset):
        key = (nt, sig)
        if key not in self._kernels:
            n, m, N = self.n, self.m, self.N
            sp = self._build_specs(sig)
            out_shape = [
                jax.ShapeDtypeStruct((N, m, n, nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((N, m, nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), self.dtype),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), jnp.int32),
                jax.ShapeDtypeStruct((nt, self.sub, self.lane), self.dtype),
            ]
            self._kernels[key] = pl.pallas_call(
                self._make_kernel(sig, sp["names"], len(sp["in_specs"])),
                grid=(nt, self.NTB),
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

    # ----------------------------------------------------------------- call
    def __call__(self, params, al_pad, Z, rho):
        n, m, N = self.n, self.m, self.N
        B = Z.X.shape[-1]
        if B % self.tile != 0:
            raise ValueError(f"batch {B} must be a multiple of {self.tile}")
        nt = B // self.tile
        f32 = self.dtype
        sig = self.param_sig(params)

        def shp(x):
            return jnp.asarray(x, f32).reshape(
                x.shape[:-1] + (nt, self.sub, self.lane)
            )

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
        arrays += [shp(Z.X[:-1]), shp(Z.U), shp(Z.X[-1])]
        arrays.append(shp(jnp.asarray(rho, f32)))
        for f, pad in zip(self._con_fams, al_pad):
            if f["stage"]:
                arrays.append(shp(pad["lam"]))
                arrays.append(shp(pad["rho"]))
            if f["terminal"]:
                arrays.append(shp(pad["lamT"]))
                arrays.append(shp(pad["rhoT"]))

        call = self._get_call(nt, sig)
        K, d, dV1, dV2, failed, J0 = call(*arrays)

        def unshp(x):
            return x.reshape(x.shape[:-3] + (B,))

        return (
            unshp(K),
            unshp(d),
            unshp(dV1),
            unshp(dV2),
            unshp(failed) > 0,
            unshp(J0),
        )


def build_backward_fused_kernel(
    prob, opts, *, interpret: bool = False, dtype=jnp.float32, sub: int = SUB
):
    """Build the fused kernel, or return None if the problem is ineligible."""
    try:
        return BackwardFusedKernel(
            prob, opts, interpret=interpret, dtype=dtype, sub=sub
        )
    except Ineligible:
        return None
