""".npy state dumps + (new) state restore.

The reference writes every FS field — including the ``old`` state, i.e. a
complete restart image — as .npy v1.0 files but has no loader
(src/IO.hpp:231-269 and SURVEY.md §5 "no resume"). Here both directions
exist; ``numpy.save`` produces the identical v1.0 header format.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


def _state_arrays(state) -> dict:
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if dataclasses.is_dataclass(v):
            for k, a in _state_arrays(v).items():
                out[f"{f.name}.{k}"] = a
        else:
            out[f.name] = np.asarray(v)
    return out


def save_state_npy(directory: str, state, grid=None) -> None:
    """One .npy per field (like to_npy, src/IO.hpp:231-269) + grid coords."""
    os.makedirs(directory, exist_ok=True)
    for name, arr in _state_arrays(state).items():
        np.save(os.path.join(directory, f"{name}.npy"), arr)
    if grid is not None:
        np.save(os.path.join(directory, "x.npy"), grid.x)
        np.save(os.path.join(directory, "y.npy"), grid.y)
        np.save(os.path.join(directory, "xm.npy"), grid.xm)
        np.save(os.path.join(directory, "ym.npy"), grid.ym)


def load_state_npy(directory: str, template):
    """Rebuild a state pytree from a dump (restart capability the reference
    lacks). ``template`` supplies the pytree structure and dtypes."""
    import jax.numpy as jnp

    def rebuild(obj, prefix=""):
        kwargs = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            key = f"{prefix}{f.name}"
            if dataclasses.is_dataclass(v):
                kwargs[f.name] = rebuild(v, prefix=f"{key}.")
            else:
                arr = np.load(os.path.join(directory, f"{key}.npy"))
                kwargs[f.name] = jnp.asarray(arr, getattr(v, "dtype", None))
        return dataclasses.replace(obj, **kwargs)

    return rebuild(template)
