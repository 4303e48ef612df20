"""Checkpoint / resume for solver state.

The reference has no serialization — warm starting is purely in-memory
shared pointers (SURVEY §5: `ilqr.hpp:222-235`, `al_solver.hpp:288-302`).
Because every piece of solver state here is an explicit pytree (trajectory,
duals/penalties, MPC state), checkpointing is generic: flatten to arrays,
save as .npz, restore into the same tree structure.  Works for `Trajectory`,
`ALState` tuples, `MPCState`, batched state — anything made of array leaves.
"""
from __future__ import annotations

import pathlib
from typing import Any

import jax
import numpy as np


def save_pytree(path, tree: Any) -> None:
    """Save a pytree of array leaves to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_pytree(path, like: Any) -> Any:
    """Load arrays saved by `save_pytree` into the structure of `like`.

    `like` provides the pytree structure (and target dtypes if its leaves are
    jax arrays); a stale structure mismatch raises with a clear error.
    """
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(like_leaves) != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves; structure expects "
            f"{len(like_leaves)}"
        )
    import jax.numpy as jnp

    out = [
        jnp.asarray(leaf, getattr(ref, "dtype", None))
        for leaf, ref in zip(leaves, like_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)
