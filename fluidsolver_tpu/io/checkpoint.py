"""Checkpoint / resume of simulation state pytrees.

The reference can dump state but never resume (SURVEY.md §5). Here a
checkpoint is a single .npz of the flattened pytree; ``restore`` rebuilds
through a template so dtypes/device placement are controlled by the caller.
An orbax-backed variant is provided for async/production use when available.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, state) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez(path, *[np.asarray(leaf) for leaf in leaves])


def restore(path: str, template):
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        arrays = [data[f"arr_{i}"] for i in range(len(leaves))]
    if len(arrays) != len(leaves):
        raise ValueError(f"checkpoint has {len(arrays)} leaves; template needs {len(leaves)}")
    new_leaves = [
        jnp.asarray(a, getattr(leaf, "dtype", None)) for a, leaf in zip(arrays, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(directory: str, state) -> None:  # pragma: no cover - optional
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), state, force=True)
    ckptr.wait_until_finished()


def restore_orbax(directory: str, template):  # pragma: no cover - optional
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(directory), template)
