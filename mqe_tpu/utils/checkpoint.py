"""Pytree checkpointing: one .npz file per snapshot, keyed by tree path.

Replaces the reference's end-of-training-only `agent.save`
(ref openrl_ws/train.py:68-70) with full-state snapshots: any pytree
(TrainState: params + optimizer state + env state + PRNG key + counters)
round-trips exactly, including zero-size leaves (empty NPC slots) that
orbax's array handlers reject.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _norm(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree) -> str:
    """Save any pytree of arrays/scalars to one .npz; returns the file path."""
    leaves, _ = jax.tree_util.tree_flatten(jax.device_get(tree))
    arrs = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    path = _norm(path)
    with open(path, "wb") as f:
        np.savez(f, **arrs)
    return path


def restore_pytree(path: str, template):
    """Restore a pytree saved by save_pytree into `template`'s structure."""
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(_norm(path))
    if len(data.files) != len(leaves_t):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(leaves_t)}"
        )
    leaves = [
        jnp.asarray(data[f"leaf_{i:05d}"], dtype=jnp.asarray(t).dtype)
        for i, t in enumerate(leaves_t)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
