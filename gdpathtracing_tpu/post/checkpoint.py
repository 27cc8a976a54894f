"""Checkpoint / resume (SURVEY.md §5).

The reference has none; its closest analog is the progressive accumulation
buffer being resumable render state (progressive_rendering.cpp:53-60). Here
that state is an explicit pytree, so checkpointing is just serialization:
save (accumulator, spp count, camera transform) — or any pytree of arrays,
including optimizer state for inverse rendering — to an .npz; resume and
keep accumulating.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_state(path: str | Path, state) -> None:
    """Serialize a pytree of arrays to .npz (treedef stored as repr for
    sanity-checking on load)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.array(str(treedef))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_state(path: str | Path, like):
    """Load into the structure of `like` (a pytree with the same treedef
    as the saved one)."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    saved = str(data["__treedef__"])
    if saved != str(treedef):
        raise ValueError(
            f"checkpoint treedef mismatch:\n saved: {saved}\n"
            f" expected: {treedef}")
    n = len(leaves)
    new_leaves = [data[f"leaf_{i}"] for i in range(n)]
    import jax.numpy as jnp
    new_leaves = [jnp.asarray(a) for a in new_leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
