"""Checkpoint/resume for controller state pytrees.

The reference has no checkpointing (SURVEY §5); its only carried state is
the warm-started u_n (examples/mppi4.rs:42), the PANOC cache, and UKF
(x, P). Here that whole controller state is a small pytree — saved/restored
to a single .npz (no pickle; array leaves only) for long scaling runs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _is_key(a) -> bool:
    try:
        return jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def save_pytree(path: str, tree) -> None:
    leaves = jax.tree.leaves(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for i, l in enumerate(leaves):
        # typed PRNG keys are stored as their raw uint32 key data
        arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(l) if _is_key(l) else l)
    np.savez(path, **arrays)


def load_pytree(path: str, template):
    """Restore into the structure of ``template`` (dtypes follow template;
    typed-PRNG-key leaves are re-wrapped from their stored key data)."""
    data = np.load(path)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects {len(t_leaves)}"
        )
    cast = []
    for l, t in zip(leaves, t_leaves):
        if _is_key(t):
            cast.append(jax.random.wrap_key_data(jnp.asarray(l)))
        else:
            cast.append(jnp.asarray(l, dtype=getattr(t, "dtype", None)))
    return jax.tree.unflatten(treedef, cast)
