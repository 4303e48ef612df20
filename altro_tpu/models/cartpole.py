"""Cartpole model: 4 states, 1 control; the classic swing-up benchmark.

State x = [p, θ, ṗ, θ̇] with θ=0 down, θ=π up; control = cart force.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..problem.dynamics import ContinuousModel, DiscreteModel, discretize

NSTATES = 4
NCONTROLS = 1


def _cartpole_dynamics(params, x, u, t):
    del t
    mc = params["mass_cart"]
    mp = params["mass_pole"]
    l = params["length"]
    g = params["gravity"]
    theta = x[1]
    pdot = x[2]
    thdot = x[3]
    f = u[0]
    s, c = jnp.sin(theta), jnp.cos(theta)
    denom = mc + mp * s**2
    pddot = (f + mp * s * (l * thdot**2 + g * c)) / denom
    thddot = (-f * c - mp * l * thdot**2 * c * s - (mc + mp) * g * s) / (l * denom)
    return jnp.stack([pdot, thdot, pddot, thddot])


def cartpole(
    mass_cart: float = 1.0,
    mass_pole: float = 0.3,
    length: float = 0.5,
    gravity: float = 9.81,
) -> ContinuousModel:
    params = {
        "mass_cart": jnp.asarray(mass_cart),
        "mass_pole": jnp.asarray(mass_pole),
        "length": jnp.asarray(length),
        "gravity": jnp.asarray(gravity),
    }
    return ContinuousModel(
        params=params, fn=_cartpole_dynamics, n=NSTATES, m=NCONTROLS,
        name="cartpole",
    )


def cartpole_rk4(**kwargs) -> DiscreteModel:
    return discretize(cartpole(**kwargs), "rk4")
