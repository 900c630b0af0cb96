"""Pytree checkpoints as npz files (checkpoint/resume, SURVEY.md §5).

The game-state side of checkpointing is the XML/JSON round-trip in
interop/serialize.py; this handles training state (params/opt-state
pytrees) without external dependencies.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    np.savez_compressed(
        path, __treedef__=np.frombuffer(
            str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (leaf order must match)."""
    data = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
