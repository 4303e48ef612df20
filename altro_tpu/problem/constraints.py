"""Constraints and cones for the augmented-Lagrangian solver.

Replaces the reference's cone classes and `Constraint<ConType>` interface
(`altro/constraints/constraint.hpp:28-206`) and the example constraints
(`examples/basic_constraints.hpp`, `examples/obstacle_constraints.hpp`).

Cones are elementwise for everything the reference ships (Zero / Identity /
NegativeOrthant), so projection Jacobians are diagonal vectors — the AL
expansion kernels exploit that instead of materializing p×p matrices
(`constraint_values.hpp:156-177` builds dense proj_jac_).
"""
from __future__ import annotations

import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .._pytree import pytree_dataclass, static_field


class Cone(enum.Enum):
    """Constraint cone tags.

    ZERO:  equality g(x,u) = 0      (`constraint.hpp:28-49`)
    NEGATIVE_ORTHANT: h(x,u) <= 0   (`constraint.hpp:98-122`)
    IDENTITY: whole space (dual of ZERO, `constraint.hpp:65-86`)
    SECOND_ORDER: ‖c[:-1]‖₂ ≤ c[-1] (Lorentz cone; self-dual).  The
        reference's interface is written for general cones
        (`docs/Overview.dox:29-43`) but ships only the first three; the SOC
        rounds out the conic-AL capability (thrust cones, friction cones).
    """

    ZERO = 0
    NEGATIVE_ORTHANT = 1
    IDENTITY = 2
    SECOND_ORDER = 3


EQUALITY = Cone.ZERO
INEQUALITY = Cone.NEGATIVE_ORTHANT


def dual_cone(cone: Cone) -> Cone:
    if cone is Cone.ZERO:
        return Cone.IDENTITY
    if cone is Cone.IDENTITY:
        return Cone.ZERO
    return cone  # NEGATIVE_ORTHANT and SECOND_ORDER are self-dual


def cone_project(cone: Cone, x):
    """Projection onto the cone (`constraint.hpp:34,77,103`)."""
    if cone is Cone.ZERO:
        return jnp.zeros_like(x)
    if cone is Cone.IDENTITY:
        return x
    if cone is Cone.SECOND_ORDER:
        return _soc_project(x)
    return jnp.minimum(x, 0.0)


def _soc_project(x):
    """Projection onto the Lorentz cone {(v, s): ‖v‖ ≤ s}, s = x[-1]."""
    v = x[:-1]
    s = x[-1]
    a = jnp.linalg.norm(v)
    inside = a <= s
    polar = a <= -s
    scale = 0.5 * (1.0 + s / jnp.maximum(a, 1e-300))
    boundary = jnp.concatenate([scale * v, (0.5 * (a + s))[None]])
    return jnp.where(inside, x, jnp.where(polar, jnp.zeros_like(x), boundary))


def cone_is_diagonal(cone: Cone) -> bool:
    """Whether the projection Jacobian is diagonal (all reference cones are)."""
    return cone is not Cone.SECOND_ORDER


def cone_jacobian_diag(cone: Cone, x):
    """Diagonal of the projection Jacobian (`constraint.hpp:39,82,108`).

    NegativeOrthant convention matches the reference: 1 where x <= 0.
    Only valid for diagonal cones; use `cone_jacobian` for the SOC.
    """
    if cone is Cone.ZERO:
        return jnp.zeros_like(x)
    if cone is Cone.IDENTITY:
        return jnp.ones_like(x)
    if cone is Cone.SECOND_ORDER:
        raise ValueError("SOC projection Jacobian is not diagonal")
    return jnp.where(x > 0, 0.0, 1.0).astype(x.dtype)


def cone_jacobian(cone: Cone, x):
    """Full projection Jacobian [p, p]."""
    if cone is not Cone.SECOND_ORDER:
        return jnp.diag(cone_jacobian_diag(cone, x))
    p = x.shape[-1]
    v = x[:-1]
    s = x[-1]
    a = jnp.maximum(jnp.linalg.norm(v), 1e-300)
    inside = jnp.linalg.norm(v) <= s
    polar = jnp.linalg.norm(v) <= -s
    c = 0.5 + s / (2.0 * a)
    eye_v = jnp.eye(p - 1, dtype=x.dtype)
    dPv_dv = c * eye_v - (s / (2.0 * a**3)) * jnp.outer(v, v)
    dPv_ds = v / (2.0 * a)
    dPs_dv = v / (2.0 * a)
    top = jnp.concatenate([dPv_dv, dPv_ds[:, None]], axis=1)
    bot = jnp.concatenate([dPs_dv, jnp.asarray(0.5, x.dtype)[None]])[None, :]
    boundary = jnp.concatenate([top, bot], axis=0)
    eye = jnp.eye(p, dtype=x.dtype)
    return jnp.where(inside, eye, jnp.where(polar, jnp.zeros_like(eye), boundary))


def cone_project_rows(cone: Cone, M):
    """Project each row of [..., p] onto the cone.

    Elementwise cones project the whole array at once; non-elementwise cones
    (SOC) map over rows.
    """
    if cone is not Cone.SECOND_ORDER:
        return cone_project(cone, M)
    flat = M.reshape((-1, M.shape[-1]))
    out = jax.vmap(_soc_project)(flat)
    return out.reshape(M.shape)


def cone_violation(cone: Cone, c):
    """Elementwise violation |c − Π_K(c)| (`constraint_values.hpp:215-220`).

    Accepts stacked rows [..., p]."""
    return jnp.abs(c - cone_project_rows(cone, c))


@pytree_dataclass
class Constraint:
    """A constraint term ``fn(params, x, u) -> c`` with ``c ∈ cone`` required.

    ``jac_fn(params, x, u) -> (Cx [p,n], Cu [p,m])`` defaults to forward-mode
    AD of ``fn``.
    """

    params: Any
    fn: Callable = static_field()
    cone: Cone = static_field()
    dim: int = static_field()  # output dimension p
    jac_fn: Optional[Callable] = static_field(default=None)
    label: str = static_field(default="constraint")
    # Structure tag for kernel special-casing: canned constraints declare
    # their algebraic form (("goal",), ("control_bound", lo, hi),
    # ("circle", xi, yi)) so fused Pallas kernels can evaluate them at the
    # tile level; None means "opaque function" (XLA paths only).
    structure: Optional[tuple] = static_field(default=None)

    def __call__(self, x, u):
        return self.fn(self.params, x, u)

    def jacobian(self, x, u):
        if self.jac_fn is not None:
            return self.jac_fn(self.params, x, u)
        return jax.jacfwd(self.fn, argnums=(1, 2))(self.params, x, u)


# ---------------------------------------------------------------------------
# Canned constraints mirroring examples/basic_constraints.hpp and
# examples/obstacle_constraints.hpp
# ---------------------------------------------------------------------------


def _goal_eval(params, x, u):
    del u
    return x - params["xf"]


def goal_constraint(xf) -> Constraint:
    """Terminal goal x == xf (`basic_constraints.hpp:15-40`)."""
    xf = jnp.asarray(xf)
    return Constraint(
        params={"xf": xf},
        fn=_goal_eval,
        cone=EQUALITY,
        dim=int(xf.shape[-1]),
        label="Goal Constraint",
        structure=("goal",),
    )


def control_bound(lb, ub) -> Constraint:
    """Box bound lb <= u <= ub, inequality-cone form
    (`basic_constraints.hpp:42-151`).

    Only finite bounds produce rows, lower bounds first then upper, matching
    the reference's output ordering (`basic_constraints.hpp:94-110`).
    """
    dtype = jnp.promote_types(
        jnp.asarray(lb).dtype, jnp.asarray(ub).dtype
    )
    lb_np = np.asarray(lb, dtype=np.float64)
    ub_np = np.asarray(ub, dtype=np.float64)
    if lb_np.shape != ub_np.shape:
        raise ValueError("Upper and lower bounds must have the same length")
    if np.any(lb_np > ub_np):
        raise ValueError("Lower bound isn't less than the upper bound")
    lo_idx = tuple(int(i) for i in np.flatnonzero(np.isfinite(lb_np)))
    hi_idx = tuple(int(i) for i in np.flatnonzero(np.isfinite(ub_np)))
    dim = len(lo_idx) + len(hi_idx)
    if dim == 0:
        raise ValueError("Control bound has no finite bounds")
    lo_arr = np.asarray(lo_idx, np.int32)
    hi_arr = np.asarray(hi_idx, np.int32)

    def eval_fn(params, x, u):
        del x
        lower = params["lb"][lo_arr] - u[lo_arr]
        upper = u[hi_arr] - params["ub"][hi_arr]
        return jnp.concatenate([lower, upper])

    # params keep the caller's dtype (an f32 problem must not promote the
    # whole AL state to f64 when x64 is enabled)
    params = {
        "lb": jnp.asarray(np.where(np.isfinite(lb_np), lb_np, 0.0), dtype),
        "ub": jnp.asarray(np.where(np.isfinite(ub_np), ub_np, 0.0), dtype),
    }
    return Constraint(
        params=params, fn=eval_fn, cone=INEQUALITY, dim=dim,
        label="Control Bound", structure=("control_bound", lo_idx, hi_idx),
    )


def circle_constraint(cx, cy, radius, x_index: int = 0, y_index: int = 1) -> Constraint:
    """Keep-out circles: −(‖p−c‖² − r²) <= 0 per obstacle
    (`obstacle_constraints.hpp:75-127`)."""
    cx = jnp.atleast_1d(jnp.asarray(cx))
    cy = jnp.atleast_1d(jnp.asarray(cy, cx.dtype))
    radius = jnp.atleast_1d(jnp.asarray(radius, cx.dtype))

    def eval_fn(params, x, u):
        del u
        px = x[x_index]
        py = x[y_index]
        d2 = (px - params["cx"]) ** 2 + (py - params["cy"]) ** 2 - params["r"] ** 2
        return -d2

    return Constraint(
        params={"cx": cx, "cy": cy, "r": radius},
        fn=eval_fn,
        cone=INEQUALITY,
        dim=int(cx.shape[0]),
        label="Circle Constraint",
        structure=("circle", x_index, y_index),
    )
