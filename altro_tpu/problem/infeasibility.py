"""Structural infeasibility certificates for batched problem fleets.

With randomized per-instance scenario parameters (BASELINE config 5) a
sampler can emit layouts whose constraints are MUTUALLY UNSATISFIABLE —
e.g. an equality goal inside an obstacle disc.  The solver then burns its
full iteration budget to MAX_PENALTY, and fleet "solved%" conflates solver
failures with sampler artifacts.  This module issues per-instance
certificates of provable infeasibility BEFORE the solve, one step past the
reference's constraint introspection (`altro/augmented_lagrangian/
al_solver.hpp:68-104` prints violations after the fact).

Certificates (conservative — a True is a proof, a False is no claim):

* goal-in-obstacle, same knot: a goal constraint `x_N = xf` and a circle
  constraint active AT knot N with `dist(xf_xy, center) < r` cannot both
  hold.
* goal-in-obstacle, reachability: if the circle family is active at knot
  N-1 and the caller supplies `step_bound` — a bound on how far the state's
  (x, y) can move in one step (e.g. v_max·h for the unicycle) — then
  `dist(xf_xy, center) < r − step_bound` forces x_{N-1} inside the
  obstacle too.

`CompactedALSolver(detect_infeasible=True)` consumes the mask inside its
single-dispatch device program: certified lanes never iterate (the masked
solve is free) and report `SolverStatus.INFEASIBLE`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["goal_obstacle_certificates"]


def goal_obstacle_certificates(prob, params, B: int, step_bound: float = 0.0):
    """Per-instance infeasibility mask [B] (True = provably infeasible).

    Parameters
    ----------
    prob : CompiledProblem (static structure: families, knots, cones).
    params : ProblemParams — shared or per-instance (trailing batch axis)
        leaves, the `batch_axes` convention.
    B : batch width of the fleet.
    step_bound : optional one-step (x, y) travel bound enabling the
        knot-(N-1) reachability certificate; 0 restricts to the same-knot
        certificate.
    """
    N = prob.N
    mask = jnp.zeros((B,), bool)
    fams = prob.constraint_families

    def bcast(leaf):
        # scalar/vector row or per-instance [..., B] -> [..., B]
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[-1] == B:
            return leaf
        return jnp.broadcast_to(leaf[..., None], leaf.shape + (B,))

    goals = [
        (f, params.constraints[i])
        for i, f in enumerate(fams)
        if f.constraint is not None
        and f.constraint.structure is not None
        and f.constraint.structure[0] == "goal"
        and N in set(int(k) for k in f.knots)
    ]
    circles = [
        (f, params.constraints[i])
        for i, f in enumerate(fams)
        if f.constraint is not None
        and f.constraint.structure is not None
        and f.constraint.structure[0] == "circle"
    ]
    for gf, gp in goals:
        xf = bcast(gp["xf"])  # [n, B]
        for cf, cp in circles:
            knots = set(int(k) for k in cf.knots)
            if N in knots:
                margin = 0.0
            elif (N - 1) in knots and step_bound > 0.0:
                margin = float(step_bound)
            else:
                continue
            _, xi, yi = cf.constraint.structure
            cx = bcast(cp["cx"])  # [n_obs, B]
            cy = bcast(cp["cy"])
            r = bcast(cp["r"])
            d = jnp.sqrt(
                (xf[xi][None, :] - cx) ** 2 + (xf[yi][None, :] - cy) ** 2
            )
            mask = mask | jnp.any(d < r - margin, axis=0)
    return mask
