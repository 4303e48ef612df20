"""Pallas TPU kernel for the batched Riccati backward sweep.

The XLA `lax.scan` version (`solver/batched.py:riccati_scan`) round-trips
its tiny carry and ~40 intermediate tensors through HBM every step.  This
kernel runs the whole sweep with the cost-to-go carry resident in VMEM and
the per-step expansion blocks streamed HBM→VMEM by the Pallas pipeline:

  * grid = (batch_tiles, N): the time axis iterates innermost, so Pallas
    double-buffers the next step's blocks while the current one computes;
    VMEM scratch persists across grid steps and holds (P, p, dV, failed).
  * the batch tile is shaped (8, 128) — one full f32 VPU register per matrix
    entry — so every unrolled multiply-add runs at 100% lane/sublane
    utilization (a [B,3,3] layout uses ~1%, a [3,B] layout ~37%).
  * the m×m Cholesky factor/solve is unrolled over static indices, with
    non-PD detection accumulated per batch element, matching the masked
    failure semantics of the scan kernel.

Semantics are identical to `riccati_scan` (same recursion as the reference's
sequential backward pass, `altro/ilqr/ilqr.hpp:385-445`): verified by the
equivalence tests in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch tile = SUB * LANE elements, one VPU register per matrix entry
SUB = 8
LANE = 128
TILE = SUB * LANE


def _mm(a, b):
    """[i,j,8,128] @ [j,k,8,128] -> [i,k,8,128], unrolled."""
    ni, nj = a.shape[0], a.shape[1]
    nk = b.shape[1]
    rows = []
    for i in range(ni):
        cols = []
        for k in range(nk):
            acc = a[i, 0] * b[0, k]
            for j in range(1, nj):
                acc = acc + a[i, j] * b[j, k]
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _mv(a, v):
    """[i,j,8,128] @ [j,8,128] -> [i,8,128], unrolled."""
    ni, nj = a.shape[0], a.shape[1]
    rows = []
    for i in range(ni):
        acc = a[i, 0] * v[0]
        for j in range(1, nj):
            acc = acc + a[i, j] * v[j]
        rows.append(acc)
    return jnp.stack(rows)


def _mT(a):
    return jnp.swapaxes(a, 0, 1)


def _chol(M, diag_add=None):
    """Unrolled Cholesky of [m,m,8,128] (+ diag_add [8,128] on the
    diagonal); returns (cols, failed[8,128])."""
    m = M.shape[0]
    cols = [[None] * m for _ in range(m)]
    failed = jnp.zeros(M.shape[-2:], jnp.bool_)
    for j in range(m):
        s = M[j, j] if diag_add is None else M[j, j] + diag_add
        for k in range(j):
            s = s - cols[j][k] * cols[j][k]
        # NaN-safe: NaN > 0 is False, so non-finite pivots flag failure too
        failed = failed | jnp.logical_not(s > 0.0)
        dj = jnp.sqrt(jnp.maximum(s, 1e-30))
        cols[j][j] = dj
        inv = 1.0 / dj
        for i in range(j + 1, m):
            s = M[i, j]
            for k in range(j):
                s = s - cols[i][k] * cols[j][k]
            cols[i][j] = s * inv
    return cols, failed


def _chol_solve_mat(L, R):
    """(L Lᵀ) X = R with R [m,r,8,128]."""
    m = len(L)
    r = R.shape[1]
    y = [None] * m
    for i in range(m):
        acc = R[i]
        for k in range(i):
            acc = acc - L[i][k][None] * y[k]
        y[i] = acc / L[i][i][None]
    x = [None] * m
    for i in reversed(range(m)):
        acc = y[i]
        for k in range(i + 1, m):
            acc = acc - L[k][i][None] * x[k]
        x[i] = acc / L[i][i][None]
    return jnp.stack(x)


def _kernel(
    A_ref, B_ref, lxx_ref, lxu_ref, luu_ref, lx_ref, lu_ref,
    PN_ref, pN_ref, rho_ref,
    K_ref, d_ref, dV1_ref, dV2_ref, failed_ref,
    P_scr, p_scr, dv_scr, fail_scr,
    *, N: int, gain_limit: float = 1e8,
):
    k_rev = pl.program_id(1)  # 0 .. N-1, step index from the end

    @pl.when(k_rev == 0)
    def _init():
        P_scr[...] = PN_ref[:, :, 0]
        p_scr[...] = pN_ref[:, 0]
        dv_scr[...] = jnp.zeros(dv_scr.shape, dv_scr.dtype)
        fail_scr[...] = jnp.zeros(fail_scr.shape, fail_scr.dtype)

    A = A_ref[0, :, :, 0]
    Bd = B_ref[0, :, :, 0]
    lxx = lxx_ref[0, :, :, 0]
    lxu = lxu_ref[0, :, :, 0]
    luu = luu_ref[0, :, :, 0]
    lx = lx_ref[0, :, 0]
    lu = lu_ref[0, :, 0]
    rho = rho_ref[0]
    P = P_scr[...]
    p = p_scr[...]

    At = _mT(A)
    AtP = _mm(At, P)
    Qxx = lxx + _mm(AtP, A)
    Qxu = lxu + _mm(AtP, Bd)
    Quu = luu + _mm(_mT(Bd), _mm(P, Bd))
    Qx = lx + _mv(At, p)
    Qu = lu + _mv(_mT(Bd), p)

    # control-only regularization: Quu + rho I, applied on the diagonal
    # inside the factorization (Mosaic dislikes tiny eye broadcasts)
    L, fail_k = _chol(Quu, diag_add=rho)
    K = -_chol_solve_mat(L, _mT(Qxu))
    d = _chol_solve_mat(L, Qu[:, None])[:, 0]
    d = -d
    # gain-magnitude guard (SolverOptions.bp_gain_limit): finite-but-
    # singular factorizations must fail → retry, not hard-abort downstream
    fail_k = fail_k | jnp.logical_not(
        (jnp.max(jnp.abs(K), axis=(0, 1)) <= gain_limit)
        & (jnp.max(jnp.abs(d), axis=0) <= gain_limit)
    )

    # CalcCostToGo (`knot_point_function_type.hpp:220-230`)
    KtQuu = _mm(_mT(K), Quu)
    p_new = Qx + _mv(KtQuu, d) + _mv(_mT(K), Qu) + _mv(Qxu, d)
    # KᵀQxuᵀ = (QxuK)ᵀ, same products/summation order — reuse the
    # transpose (bitwise identical, one fewer n×n multiply per knot)
    QK = _mm(Qxu, K)
    P_new = Qxx + _mm(KtQuu, K) + _mT(QK) + QK

    dV1_new = (d * Qu).sum(axis=0)
    dV2_new = 0.5 * (d * _mv(Quu, d)).sum(axis=0)

    was_failed = fail_scr[...] > 0
    now_failed = was_failed | fail_k
    keep = ~now_failed

    P_scr[...] = jnp.where(keep[None, None], P_new, P)
    p_scr[...] = jnp.where(keep[None], p_new, p)
    dv_scr[0] = jnp.where(keep, dv_scr[0] + dV1_new, dv_scr[0])
    dv_scr[1] = jnp.where(keep, dv_scr[1] + dV2_new, dv_scr[1])
    fail_scr[...] = now_failed.astype(fail_scr.dtype)

    K_ref[0, :, :, 0] = K
    d_ref[0, :, 0] = d

    @pl.when(k_rev == N - 1)
    def _finalize():
        dV1_ref[0] = dv_scr[0]
        dV2_ref[0] = dv_scr[1]
        failed_ref[0] = fail_scr[...]


def riccati_pallas(exp: dict, rho, *, interpret: bool = False, gain_limit: float = 1e8):
    """Run the backward sweep; same contract as `riccati_scan`.

    exp: dict with A [N,n,n,B], B [N,n,m,B], lxx/lxu/luu/lx/lu stacked
    [N+1,...,B]; rho [B].  B must be a multiple of 1024 (the (8,128) tile).
    Returns (K [N,m,n,B], d [N,m,B], dV1 [B], dV2 [B], failed [B]).
    """
    A = exp["A"]
    N, n, _, B = A.shape
    m = exp["B"].shape[2]
    if B % TILE != 0:
        raise ValueError(f"batch {B} must be a multiple of {TILE}")
    nt = B // TILE
    dt = A.dtype

    def shape2(x):  # [..., B] -> [..., nt, SUB, LANE]
        return x.reshape(x.shape[:-1] + (nt, SUB, LANE))

    args = (
        shape2(A),
        shape2(exp["B"]),
        shape2(exp["lxx"][:N]),
        shape2(exp["lxu"][:N]),
        shape2(exp["luu"][:N]),
        shape2(exp["lx"][:N]),
        shape2(exp["lu"][:N]),
        shape2(exp["lxx"][N]),
        shape2(exp["lx"][N]),
        shape2(jnp.asarray(rho, dt)),
    )

    # block index maps: batch tile b, reversed time N-1-k
    def step_map(extra_dims):
        def im(b, k):
            return (N - 1 - k, *([0] * extra_dims), b, 0, 0)

        return im

    def tile_map(extra_dims):
        def im(b, k):
            return (*([0] * extra_dims), b, 0, 0)

        return im

    in_specs = [
        pl.BlockSpec((1, n, n, 1, SUB, LANE), step_map(2)),  # A
        pl.BlockSpec((1, n, m, 1, SUB, LANE), step_map(2)),  # B
        pl.BlockSpec((1, n, n, 1, SUB, LANE), step_map(2)),  # lxx
        pl.BlockSpec((1, n, m, 1, SUB, LANE), step_map(2)),  # lxu
        pl.BlockSpec((1, m, m, 1, SUB, LANE), step_map(2)),  # luu
        pl.BlockSpec((1, n, 1, SUB, LANE), step_map(1)),  # lx
        pl.BlockSpec((1, m, 1, SUB, LANE), step_map(1)),  # lu
        pl.BlockSpec((n, n, 1, SUB, LANE), tile_map(2)),  # PN
        pl.BlockSpec((n, 1, SUB, LANE), tile_map(1)),  # pN
        pl.BlockSpec((1, SUB, LANE), tile_map(0)),  # rho
    ]
    out_specs = [
        pl.BlockSpec((1, m, n, 1, SUB, LANE), step_map(2)),  # K
        pl.BlockSpec((1, m, 1, SUB, LANE), step_map(1)),  # d
        pl.BlockSpec((1, SUB, LANE), tile_map(0)),  # dV1
        pl.BlockSpec((1, SUB, LANE), tile_map(0)),  # dV2
        pl.BlockSpec((1, SUB, LANE), tile_map(0)),  # failed
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, m, n, nt, SUB, LANE), dt),
        jax.ShapeDtypeStruct((N, m, nt, SUB, LANE), dt),
        jax.ShapeDtypeStruct((nt, SUB, LANE), dt),
        jax.ShapeDtypeStruct((nt, SUB, LANE), dt),
        jax.ShapeDtypeStruct((nt, SUB, LANE), jnp.int32),
    ]
    scratch_shapes = [
        pltpu.VMEM((n, n, SUB, LANE), dt),
        pltpu.VMEM((n, SUB, LANE), dt),
        pltpu.VMEM((2, SUB, LANE), dt),
        pltpu.VMEM((SUB, LANE), jnp.int32),
    ]

    kernel = functools.partial(_kernel, N=N, gain_limit=float(gain_limit))
    K, d, dV1, dV2, failed = pl.pallas_call(
        kernel,
        grid=(nt, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*args)

    def unshape(x):
        return x.reshape(x.shape[:-3] + (B,))

    return (
        unshape(K),
        unshape(d),
        unshape(dV1),
        unshape(dV2),
        unshape(failed) > 0,
    )
