"""Diffuse (volume-penalty) immersed boundary.

Staggered solid fractions by quadrature + direct forcing before projection
(reference: examples/DiffuseIB.cpp:221-239, 296-315)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.fields import register_pytree_dataclass
from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.vof.init import gauss_cell_average


@register_pytree_dataclass
@dataclasses.dataclass
class DiffuseIB:
    ib: jnp.ndarray        # cell-centered solid fraction
    ib_u: jnp.ndarray      # U-staggered control-volume solid fraction
    ib_v: jnp.ndarray      # V-staggered control-volume solid fraction


def solid_fractions(indicator, grid: Grid, n: int = 16) -> DiffuseIB:
    """Solid fractions over the staggered control volumes (the U volume is
    [x_i - dx/2, x_i + dx/2] x [y_j, y_j+1], DiffuseIB.cpp:222-238)."""
    def f(xs, ys):
        return np.asarray(indicator(xs, ys), dtype=np.float64)

    g = grid
    x, y, dx, dy = g.x, g.y, g.dx, g.dy

    Xf, Yl = np.meshgrid(x, y[:-1], indexing="ij")
    ib_u = gauss_cell_average(f, Xf - dx / 2, Xf + dx / 2, Yl, Yl + dy, n)

    Xl, Yf = np.meshgrid(x[:-1], y, indexing="ij")
    ib_v = gauss_cell_average(f, Xl, Xl + dx, Yf - dy / 2, Yf + dy / 2, n)

    X0, Y0 = np.meshgrid(x[:-1], y[:-1], indexing="ij")
    ib = gauss_cell_average(f, X0, X0 + dx, Y0, Y0 + dy, n)

    return DiffuseIB(ib=jnp.asarray(ib), ib_u=jnp.asarray(ib_u), ib_v=jnp.asarray(ib_v))


def apply_direct_forcing(U, V, ib: DiffuseIB, u_target=0.0, v_target=0.0):
    """U += ib*(U_target - U) on the interior (DiffuseIB.cpp:296-312).
    Returns (U, V, fU*dt, fV*dt)."""
    dU = ib.ib_u[1:-1, 1:-1] * (u_target - U[1:-1, 1:-1])
    dV = ib.ib_v[1:-1, 1:-1] * (v_target - V[1:-1, 1:-1])
    U = U.at[1:-1, 1:-1].add(dU)
    V = V.at[1:-1, 1:-1].add(dV)
    return U, V, dU, dV
