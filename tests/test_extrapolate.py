"""Divergence-free extrapolation (ops/extrapolate.py).

Completes the reference's unfinished examples/DivFreeExtrapolation.cpp
(its main ends at "TODO: Implement the divergence-free extrapolation",
line 94): TGV velocity known inside a circle, extrapolated outward. Checks:
known faces untouched, extrapolated cells divergence-free, constant fields
extrapolate exactly.
"""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.ops.extrapolate import (
    constant_extrapolate,
    div_free_extrapolate,
)


def _setup(n=24):
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    in_u = (Xu - 0.5) ** 2 + (Yu - 0.5) ** 2 <= 0.25**2
    in_v = (Xv - 0.5) ** 2 + (Yv - 0.5) ** 2 <= 0.25**2
    U0 = jnp.asarray(np.where(in_u, np.sin(2 * np.pi * Xu) * np.cos(2 * np.pi * Yu), 0.0))
    V0 = jnp.asarray(np.where(in_v, -np.cos(2 * np.pi * Xv) * np.sin(2 * np.pi * Yv), 0.0))
    return g, U0, V0, jnp.asarray(in_u), jnp.asarray(in_v)


def test_constant_field_extrapolates_exactly():
    g, _, _, in_u, _ = _setup()
    f = jnp.where(in_u, 3.5, 0.0)
    out = constant_extrapolate(f, in_u, n_sweeps=64)
    assert float(jnp.max(jnp.abs(out - 3.5))) < 1e-12


def test_div_free_extrapolation():
    g, U0, V0, in_u, in_v = _setup()
    U, V, rel, iters = div_free_extrapolate(U0, V0, in_u, in_v, g, tol=1e-11)
    assert float(rel) < 1e-10

    # known faces are untouched
    assert float(jnp.max(jnp.abs(jnp.where(in_u, U - U0, 0.0)))) == 0.0
    assert float(jnp.max(jnp.abs(jnp.where(in_v, V - V0, 0.0)))) == 0.0

    # every interior cell with an unknown face is now divergence-free
    div = stencil.divergence(U, V, g.dx, g.dy)
    Xc, Yc = np.meshgrid(g.xm, g.ym, indexing="ij")
    outside = jnp.asarray((Xc - 0.5) ** 2 + (Yc - 0.5) ** 2 > 0.2**2)
    outside = outside.at[0, :].set(False).at[-1, :].set(False)
    outside = outside.at[:, 0].set(False).at[:, -1].set(False)
    before = stencil.divergence(U0, V0, g.dx, g.dy)
    d0 = float(jnp.max(jnp.abs(jnp.where(outside, before, 0.0))))
    d1 = float(jnp.max(jnp.abs(jnp.where(outside, div, 0.0))))
    assert d0 > 1.0  # the raw masked field is badly non-solenoidal
    assert d1 < 1e-9, d1


def test_div_free_extrapolation_sealed():
    """Sealed boundary: singular path; divergence drops to the uniform
    incompatibility level of the known data (discrete TGV sampling error)."""
    from fluidsolver_tpu.ops.extrapolate import (
        constant_extrapolate,
        project_div_free,
    )

    g, U0, V0, in_u, in_v = _setup(n=32)
    n_sweeps = max(U0.shape)
    U_ext = constant_extrapolate(U0, in_u, n_sweeps)
    V_ext = constant_extrapolate(V0, in_v, n_sweeps)
    U, V, rel, _ = project_div_free(
        U_ext, V_ext, in_u, in_v, g, tol=1e-11, max_iter=4000,
        seal_boundary=True,
    )
    # the projection pins the boundary faces (BCs own them in sealed mode)
    assert float(jnp.max(jnp.abs(U[1, 1:-1] - U_ext[1, 1:-1]))) == 0.0
    assert float(jnp.max(jnp.abs(U[-2, 1:-1] - U_ext[-2, 1:-1]))) == 0.0
    div = stencil.divergence(U, V, g.dx, g.dy)
    Xc, Yc = np.meshgrid(g.xm, g.ym, indexing="ij")
    outside = jnp.asarray((Xc - 0.5) ** 2 + (Yc - 0.5) ** 2 > 0.25**2)
    outside = outside.at[0, :].set(False).at[-1, :].set(False)
    outside = outside.at[:, 0].set(False).at[:, -1].set(False)
    d1 = float(jnp.max(jnp.abs(jnp.where(outside, div, 0.0))))
    # incompatibility of the sampled TGV on the jagged circle boundary is
    # O(h); the leftover uniform divergence must be far below the O(1) raw
    # divergence of the unextrapolated field
    assert d1 < 0.2, d1
