"""Kinematic unicycle model (`examples/unicycle.hpp`, `examples/unicycle.cpp:12-43`).

States (x, y, θ); controls (v, ω); ẋ = v cosθ, ẏ = v sinθ, θ̇ = ω.
The Jacobian/Hessian the reference hand-codes come for free from AD here.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..problem.dynamics import ContinuousModel, DiscreteModel, discretize

NSTATES = 3
NCONTROLS = 2


def _unicycle_dynamics(params, x, u, t):
    del params, t
    theta = x[2]
    v = u[0]
    omega = u[1]
    return jnp.stack([v * jnp.cos(theta), v * jnp.sin(theta), omega])


def unicycle() -> ContinuousModel:
    return ContinuousModel(
        params=None, fn=_unicycle_dynamics, n=NSTATES, m=NCONTROLS, name="unicycle"
    )


def unicycle_rk4() -> DiscreteModel:
    """RK4-discretized unicycle, the ModelType of the canned problems
    (`examples/problems/unicycle.hpp:33`)."""
    return discretize(unicycle(), "rk4")
