"""Velocity and scalar boundary conditions on the ghost ring.

Pure-functional re-design of the reference's BC layer
(reference: src/BoundaryConditions.hpp:14-280). Each BC variant fills ghost
and/or boundary-face values; the four sides are applied in the order
left, right, bottom, top, exactly as ``apply_velocity_bconds``
(src/BoundaryConditions.hpp:215-224).

BC values may be Python floats or callables ``f(coord, t) -> value``; callables
are traced once under ``jit`` (the time-dependent Dirichlet inflow of
examples/IncompSolver.cpp:46-60 works by passing ``t`` as a traced scalar).

Index mapping (see core/grid.py): logical index r -> array index r+1.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Union

import jax.numpy as jnp

from fluidsolver_tpu.core.fields import col_set, row_set
from fluidsolver_tpu.core.grid import Grid

BCValue = Union[float, Callable]


def _eval(value: BCValue, coords: jnp.ndarray, t) -> jnp.ndarray:
    """Evaluate a constant or function-valued BC at coordinates ``coords``."""
    if callable(value):
        return value(coords, t)
    return jnp.full_like(coords, value)


@dataclasses.dataclass(frozen=True)
class Dirichlet:
    """Fixed velocity on a wall; value or function of (tangential coord, t)."""

    u: BCValue = 0.0
    v: BCValue = 0.0


@dataclasses.dataclass(frozen=True)
class Neumann:
    """Zero-gradient; ``clipped`` prevents inflow at an outlet
    (reference: src/BoundaryConditions.hpp:88-134)."""

    clipped: bool = False


@dataclasses.dataclass(frozen=True)
class Periodic:
    pass


@dataclasses.dataclass(frozen=True)
class Symmetry:
    pass


BCType = Union[Dirichlet, Neumann, Periodic, Symmetry]


@dataclasses.dataclass(frozen=True)
class FlowBCs:
    left: BCType
    right: BCType
    bottom: BCType
    top: BCType


def apply_velocity_bcs(U: jnp.ndarray, V: jnp.ndarray, grid: Grid, bcs: FlowBCs, t=-1.0):
    """Fill ghost/boundary-face values of the staggered velocity.

    Returns updated (U, V). Mirrors src/BoundaryConditions.hpp:215-224.
    """
    nx = grid.nx
    ny = grid.ny
    dtype = U.dtype
    ym = jnp.asarray(grid.ym, dtype)  # length ny+2, for U rows
    yf = jnp.asarray(grid.y, dtype)   # length ny+3, for V rows
    xm = jnp.asarray(grid.xm, dtype)  # length nx+2, for V cols
    xf = jnp.asarray(grid.x, dtype)   # length nx+3, for U cols

    # ---- LEFT (x = x_min) -------------------------------------------------
    b = bcs.left
    if isinstance(b, Dirichlet):
        ubc = _eval(b.u, ym, t)
        vbc = _eval(b.v, yf, t)
        U = row_set(row_set(U, 0, ubc), 1, ubc)
        V = row_set(V, 0, 2.0 * vbc - V[1, :])
    elif isinstance(b, Neumann):
        g = jnp.minimum(U[1, :], 0.0) if b.clipped else U[1, :]
        U = row_set(U, 0, g)
        V = row_set(V, 0, V[1, :])
    elif isinstance(b, Periodic):
        U = row_set(U, 0, U[nx, :])
        V = row_set(V, 0, V[nx, :])
    elif isinstance(b, Symmetry):
        U = row_set(row_set(U, 0, -U[2, :]), 1, 0.0)
        V = row_set(V, 0, V[1, :])

    # ---- RIGHT (x = x_max) ------------------------------------------------
    b = bcs.right
    if isinstance(b, Dirichlet):
        ubc = _eval(b.u, ym, t)
        vbc = _eval(b.v, yf, t)
        U = row_set(row_set(U, nx + 1, ubc), nx + 2, ubc)
        V = row_set(V, nx + 1, 2.0 * vbc - V[nx, :])
    elif isinstance(b, Neumann):
        g = jnp.maximum(U[nx + 1, :], 0.0) if b.clipped else U[nx + 1, :]
        U = row_set(U, nx + 2, g)
        V = row_set(V, nx + 1, V[nx, :])
    elif isinstance(b, Periodic):
        U = row_set(U, nx + 2, U[2, :])
        V = row_set(V, nx + 1, V[1, :])
        if isinstance(bcs.left, Periodic):
            # Reconcile the two images of the shared periodic face (logical
            # faces 0 and nx are the SAME physical face). The reference keeps
            # both and lets them drift apart — the pressure ghost closure is
            # not periodic, so the boundary-face momentum updates differ and
            # sum(div) over the interior stops telescoping to zero, which
            # reappears as a uniform divergence offset after projection (see
            # linsys.build_pressure_rhs). Averaging is symmetric and exact
            # whenever the field is truly periodic.
            shared = 0.5 * (U[1, :] + U[nx + 1, :])
            U = row_set(row_set(U, 1, shared), nx + 1, shared)
    elif isinstance(b, Symmetry):
        U = row_set(row_set(U, nx + 2, -U[nx, :]), nx + 1, 0.0)
        V = row_set(V, nx + 1, V[nx, :])

    # ---- BOTTOM (y = y_min) -----------------------------------------------
    b = bcs.bottom
    if isinstance(b, Dirichlet):
        ubc = _eval(b.u, xf, t)
        vbc = _eval(b.v, xm, t)
        U = col_set(U, 0, 2.0 * ubc - U[:, 1])
        V = col_set(col_set(V, 0, vbc), 1, vbc)
    elif isinstance(b, Neumann):
        U = col_set(U, 0, U[:, 1])
        g = jnp.minimum(V[:, 1], 0.0) if b.clipped else V[:, 1]
        V = col_set(V, 0, g)
    elif isinstance(b, Periodic):
        U = col_set(U, 0, U[:, ny])
        V = col_set(V, 0, V[:, ny])
    elif isinstance(b, Symmetry):
        U = col_set(U, 0, U[:, 1])
        V = col_set(col_set(V, 0, -V[:, 2]), 1, 0.0)

    # ---- TOP (y = y_max) ----------------------------------------------------
    b = bcs.top
    if isinstance(b, Dirichlet):
        ubc = _eval(b.u, xf, t)
        vbc = _eval(b.v, xm, t)
        U = col_set(U, ny + 1, 2.0 * ubc - U[:, ny])
        V = col_set(col_set(V, ny + 1, vbc), ny + 2, vbc)
    elif isinstance(b, Neumann):
        U = col_set(U, ny + 1, U[:, ny])
        g = jnp.maximum(V[:, ny + 1], 0.0) if b.clipped else V[:, ny + 1]
        V = col_set(V, ny + 2, g)
    elif isinstance(b, Periodic):
        U = col_set(U, ny + 1, U[:, 1])
        V = col_set(V, ny + 2, V[:, 2])
        if isinstance(bcs.bottom, Periodic):
            # shared-face reconciliation; see the right/left Periodic branch
            shared = 0.5 * (V[:, 1] + V[:, ny + 1])
            V = col_set(col_set(V, 1, shared), ny + 1, shared)
    elif isinstance(b, Symmetry):
        U = col_set(U, ny + 1, U[:, ny])
        V = col_set(col_set(V, ny + 2, -V[:, ny]), ny + 1, 0.0)

    return U, V


def apply_neumann_scalar(f: jnp.ndarray) -> jnp.ndarray:
    """Ghost ring := nearest interior value, x-direction first then y
    (corner semantics match src/BoundaryConditions.hpp:227-252)."""
    f = row_set(f, 0, f[1, :])
    f = row_set(f, -1, f[-2, :])
    f = col_set(f, 0, f[:, 1])
    f = col_set(f, -1, f[:, -2])
    return f


def apply_dirichlet_scalar(f: jnp.ndarray, value) -> jnp.ndarray:
    """Ghost ring := constant value (src/BoundaryConditions.hpp:255-280)."""
    f = row_set(f, 0, value)
    f = row_set(f, -1, value)
    f = col_set(f, 0, value)
    f = col_set(f, -1, value)
    return f
