"""Quadrotor model: 13 states, 4 rotor thrusts.

Demonstrates the framework beyond the reference's tiny models (n ≤ 6):
quaternion-attitude rigid body with per-rotor thrust inputs, the standard
trajectory-optimization quadrotor (cf. Altro.jl's quadrotor example — the
reference solver's companion model zoo).

State  x = [p(3), q(4, wxyz unit quaternion), v(3, world), ω(3, body)]
Input  u = [f1..f4] rotor thrusts (N).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..problem.dynamics import ContinuousModel, DiscreteModel, discretize

NSTATES = 13
NCONTROLS = 4


def _quat_multiply(q, r):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = r
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _cross3(a, b):
    """Component cross product over the LEADING axis — shape-polymorphic:
    works for [3] states and for the fused kernels' [3, sub, lane] tiles
    (jnp.cross assumes the trailing axis)."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (body -> world)."""
    w = q[0]
    u = q[1:]
    return v + 2.0 * _cross3(u, _cross3(u, v) + w * v)


def _quadrotor_dynamics(params, x, u, t):
    """Shape-polymorphic over trailing axes: every op is component-wise in
    the leading (state) axis, so the same fn serves the per-instance
    solver (x [13]) and the fused Pallas kernels (x [13, sub, lane])."""
    del t
    mass = params["mass"]
    J = params["J"]  # diagonal inertia [3]
    g = params["gravity"]
    kf = params["kf"]  # thrust coefficient
    km = params["km"]  # moment coefficient
    L = params["arm_length"]

    q = x[3:7]
    v = x[7:10]
    omega = x[10:13]
    zero = jnp.zeros_like(x[0])

    F = kf * u  # rotor thrusts
    thrust_body = jnp.stack([zero, zero, F.sum(axis=0)])
    # torques: rotors at +x, +y, -x, -y arms; alternating spin directions
    tau = jnp.stack(
        [
            L * kf * (u[1] - u[3]),
            L * kf * (u[2] - u[0]),
            km * (u[0] - u[1] + u[2] - u[3]),
        ]
    )

    pdot = v
    qdot = 0.5 * _quat_multiply(
        q, jnp.concatenate([zero[None], omega], axis=0)
    )
    g_vec = jnp.stack([zero, zero, zero - g])
    vdot = g_vec + _quat_rotate(q, thrust_body) / mass
    Jw = jnp.stack([J[i] * omega[i] for i in range(3)])
    wnum = tau - _cross3(omega, Jw)
    wdot = jnp.stack([wnum[i] / J[i] for i in range(3)])
    return jnp.concatenate([pdot, qdot, vdot, wdot], axis=0)


def quadrotor(
    mass: float = 0.5,
    J=(0.0023, 0.0023, 0.004),
    gravity: float = 9.81,
    kf: float = 1.0,
    km: float = 0.0245,
    arm_length: float = 0.1750,
) -> ContinuousModel:
    params = {
        "mass": jnp.asarray(mass),
        "J": jnp.asarray(J),
        "gravity": jnp.asarray(gravity),
        "kf": jnp.asarray(kf),
        "km": jnp.asarray(km),
        "arm_length": jnp.asarray(arm_length),
    }
    return ContinuousModel(
        params=params, fn=_quadrotor_dynamics, n=NSTATES, m=NCONTROLS,
        name="quadrotor",
    )


def quadrotor_rk4(**kwargs) -> DiscreteModel:
    return discretize(quadrotor(**kwargs), "rk4")


def hover_state(position=(0.0, 0.0, 1.0)) -> jnp.ndarray:
    """Hover state at a position: identity attitude, zero rates."""
    return jnp.concatenate(
        [
            jnp.asarray(position, jnp.result_type(float)),
            jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.zeros(6),
        ]
    )


def hover_controls(mass: float = 0.5, gravity: float = 9.81, kf: float = 1.0):
    """Per-rotor thrust that exactly cancels gravity."""
    return jnp.full(4, mass * gravity / (4.0 * kf))
