"""Triple-integrator model (`examples/triple_integrator.hpp`,
`examples/triple_integrator.cpp:9-45`).

State [pos(dof), vel(dof), acc(dof)], control = jerk(dof); linear dynamics.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..problem.dynamics import ContinuousModel, DiscreteModel, discretize


def _make_dynamics(dof: int):
    def fn(params, x, u, t):
        del params, t
        return jnp.concatenate([x[dof : 2 * dof], x[2 * dof : 3 * dof], u])

    return fn


def triple_integrator(dof: int = 1) -> ContinuousModel:
    if dof <= 0:
        raise ValueError("The degrees of freedom must be greater than 0")
    return ContinuousModel(
        params=None,
        fn=_make_dynamics(dof),
        n=3 * dof,
        m=dof,
        name=f"triple_integrator{dof}",
    )


def triple_integrator_rk4(dof: int = 1) -> DiscreteModel:
    return discretize(triple_integrator(dof), "rk4")
