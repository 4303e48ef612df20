"""Cost functions and their second-order expansions.

Replaces `CostFunction` (`altro/problem/costfunction.hpp:52-73`) and the
`QuadraticCost`/`LQRCost` example (`examples/quadratic_cost.hpp:12-78`).

A cost is a pure function ``fn(params, x, u) -> scalar``.  Expansions come
from JAX AD by default (the reference requires hand-written gradients and
blockwise Hessians, `costfunction.hpp:57-72`); costs with known structure can
override ``expand_fn`` — `QuadraticCost` does, since its Hessian is its own
parameters.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .._pytree import pytree_dataclass, static_field


@pytree_dataclass
class CostExpansionTerms:
    """Second-order expansion of one knot's cost, the stacked analog of
    `CostExpansion<n,m>` (`altro/ilqr/cost_expansion.hpp:26-141`)."""

    J: jax.Array
    lx: jax.Array
    lu: jax.Array
    lxx: jax.Array
    lxu: jax.Array  # [n, m] cross term, matches dxdu in the reference
    luu: jax.Array


@pytree_dataclass
class Cost:
    """A cost term: ``fn(params, x, u) -> scalar``.

    ``expand_fn(params, x, u) -> CostExpansionTerms`` optionally overrides the
    AD-based expansion.
    """

    params: Any
    fn: Callable = static_field()
    expand_fn: Optional[Callable] = static_field(default=None)
    name: str = static_field(default="cost")

    def __call__(self, x, u):
        return self.fn(self.params, x, u)

    def expand(self, x, u) -> CostExpansionTerms:
        if self.expand_fn is not None:
            return self.expand_fn(self.params, x, u)
        return ad_expansion(self.fn, self.params, x, u)


def ad_expansion(fn: Callable, params, x, u) -> CostExpansionTerms:
    """Generic value/gradient/Hessian expansion via AD.

    Matches the finite-difference-validated analytic expansions of the
    reference (`cost_expansion.hpp:118-125`) for arbitrary smooth costs.
    """
    J, (lx, lu) = jax.value_and_grad(fn, argnums=(1, 2))(params, x, u)
    hess = jax.jacfwd(jax.grad(fn, argnums=(1, 2)), argnums=(1, 2))(params, x, u)
    (lxx, lxu), (_, luu) = hess
    return CostExpansionTerms(J=J, lx=lx, lu=lu, lxx=lxx, lxu=lxu, luu=luu)


def _quadcost_eval(params, x, u):
    Q, R, H, q, r, c = (
        params["Q"],
        params["R"],
        params["H"],
        params["q"],
        params["r"],
        params["c"],
    )
    # 0.5 x'Qx + x'Hu + 0.5 u'Ru + q'x + r'u + c  (`quadratic_cost.cpp:8-11`)
    return (
        0.5 * x @ (Q @ x)
        + x @ (H @ u)
        + 0.5 * u @ (R @ u)
        + q @ x
        + r @ u
        + c
    )


def _quadcost_expand(params, x, u):
    Q, R, H, q, r = params["Q"], params["R"], params["H"], params["q"], params["r"]
    J = _quadcost_eval(params, x, u)
    # `quadratic_cost.cpp:14-28`
    lx = Q @ x + q + H @ u
    lu = R @ u + r + H.T @ x
    return CostExpansionTerms(J=J, lx=lx, lu=lu, lxx=Q, lxu=H, luu=R)


def quadratic_cost(Q, R, H=None, q=None, r=None, c=0.0, *, validate=True) -> Cost:
    """General quadratic cost ½xᵀQx + xᵀHu + ½uᵀRu + qᵀx + rᵀu + c."""
    Q = jnp.asarray(Q)
    R = jnp.asarray(R, Q.dtype)
    n, m = Q.shape[0], R.shape[0]
    H = jnp.zeros((n, m), Q.dtype) if H is None else jnp.asarray(H, Q.dtype)
    q = jnp.zeros((n,), Q.dtype) if q is None else jnp.asarray(q, Q.dtype)
    r = jnp.zeros((m,), Q.dtype) if r is None else jnp.asarray(r, Q.dtype)
    c = jnp.asarray(c, Q.dtype)
    if validate and not _is_traced(Q, R):
        _validate_quadratic(np.asarray(Q), np.asarray(R))
    params = {"Q": Q, "R": R, "H": H, "q": q, "r": r, "c": c}
    return Cost(
        params=params, fn=_quadcost_eval, expand_fn=_quadcost_expand, name="quadratic"
    )


def _is_traced(*arrays) -> bool:
    import jax.core

    return any(isinstance(a, jax.core.Tracer) for a in arrays)


def _validate_quadratic(Q: np.ndarray, R: np.ndarray) -> None:
    """Symmetry / semidefiniteness checks (`quadratic_cost.cpp:30-63`).

    Host-side validation standing in for the reference's construction-time
    asserts; skipped automatically for traced inputs.
    """
    if not (np.allclose(Q, Q.T) and np.allclose(R, R.T)):
        raise ValueError("Q and R must be symmetric")
    if np.any(np.linalg.eigvalsh(Q) < -1e-10):
        raise ValueError("Q must be positive semi-definite")


def lqr_cost(Q, R, xref, uref=None, *, terminal: bool = False, validate=True) -> Cost:
    """Tracking cost ½‖x−xref‖²_Q + ½‖u−uref‖²_R (`quadratic_cost.hpp:29-39`)."""
    Q = jnp.asarray(Q)
    R = jnp.asarray(R, Q.dtype)
    xref = jnp.asarray(xref, Q.dtype)
    uref = (
        jnp.zeros((R.shape[0],), Q.dtype) if uref is None else jnp.asarray(uref, Q.dtype)
    )
    q = -(Q @ xref)
    r = -(R @ uref)
    c = 0.5 * xref @ (Q @ xref) + 0.5 * uref @ (R @ uref)
    if validate and not terminal and not _is_traced(R):
        Rnp = np.asarray(R)
        if np.any(np.linalg.eigvalsh(Rnp) <= 0):
            raise ValueError("R must be positive definite for a non-terminal cost")
    return quadratic_cost(Q, R, None, q, r, c, validate=validate)
