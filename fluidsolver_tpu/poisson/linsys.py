"""Variable-coefficient pressure-Poisson system assembly.

Re-design of the reference's ``LinearSystem`` (src/LinearSystem.hpp:10-155):
the 5-point operator ``-vol * div((1/rho_face) grad)`` is assembled over the
FULL ghost-inclusive box — the unknowns are all (nx+2) x (ny+2) cells — with
one-sided closure at the box edges (homogeneous Neumann), an optional
Dirichlet-pinned edge, and mean subtraction of the RHS in the all-Neumann
(singular) case.

The operator is kept matrix-free as five coefficient arrays
``(aC, aL, aR, aB, aT)``, each of box shape; this is what the multigrid and
CG layers consume. Assembly is a handful of elementwise expressions, so
unlike HYPRE PFMG there is no setup cost when rho changes every subiteration
(the reference pays a full PFMG re-setup there, examples/TwoPhaseSolver.cpp:360).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fluidsolver_tpu.core.fields import (col_set,
                                           register_pytree_dataclass, row_set)

# Dirichlet pinning side (reference: PSDirichlet, src/LinearSystem.hpp:10)
PIN_NONE = None
PIN_LEFT = "left"
PIN_RIGHT = "right"
PIN_BOTTOM = "bottom"
PIN_TOP = "top"


@register_pytree_dataclass
@dataclasses.dataclass
class StencilOp:
    """5-point operator as coefficient arrays over the box."""

    aC: jnp.ndarray
    aL: jnp.ndarray
    aR: jnp.ndarray
    aB: jnp.ndarray
    aT: jnp.ndarray


def assemble_pressure_operator(
    rho_u: jnp.ndarray,
    rho_v: jnp.ndarray,
    dx: float,
    dy: float,
    pin: Optional[str] = PIN_NONE,
) -> StencilOp:
    """Build the operator from the staggered face densities
    (src/LinearSystem.hpp:32-122). ``rho_u``: (nx+3, ny+2), ``rho_v``:
    (nx+2, ny+3); box unknowns: (nx+2, ny+2)."""
    vol = dx * dy
    cx = vol / (dx * dx)
    cy = vol / (dy * dy)

    # face conductances for every box cell: left face of box cell b is
    # rho_u[b], right face rho_u[b+1] (same index arithmetic as the C++).
    gL = cx / rho_u[:-1, :]
    gR = cx / rho_u[1:, :]
    gB = cy / rho_v[:, :-1]
    gT = cy / rho_v[:, 1:]

    # one-sided closure at the box edges: drop the outward coupling AND its
    # diagonal contribution (the reference adds neither).
    # iota+where (not .at[].set): edge-row/col scatters force GSPMD
    # full-field all-gathers (see core/fields.row_set)
    ii = jax.lax.broadcasted_iota(jnp.int32, gL.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, gL.shape, 1)
    edgeL = jnp.where(ii > 0, gL, 0.0)
    edgeR = jnp.where(ii < gR.shape[0] - 1, gR, 0.0)
    edgeB = jnp.where(jj > 0, gB, 0.0)
    edgeT = jnp.where(jj < gT.shape[1] - 1, gT, 0.0)

    aC = edgeL + edgeR + edgeB + edgeT
    aL = -edgeL
    aR = -edgeR
    aB = -edgeB
    aT = -edgeT

    if pin is not None:
        # Pinned edge: identity rows with zero RHS (src/LinearSystem.hpp:79-121).
        # Additionally eliminate the couplings *into* the pinned cells — their
        # value is exactly 0, so the solution is unchanged, and the reduced
        # operator stays symmetric (required for CG; the reference hands the
        # non-symmetrized version to HYPRE PCG, which merely tolerates it).
        one = jnp.ones(())
        zero = jnp.zeros(())
        if pin == PIN_LEFT:
            aC = row_set(aC, 0, one); aL = row_set(aL, 0, zero); aR = row_set(aR, 0, zero)
            aB = row_set(aB, 0, zero); aT = row_set(aT, 0, zero)
            aL = row_set(aL, 1, zero)
        elif pin == PIN_RIGHT:
            aC = row_set(aC, -1, one); aL = row_set(aL, -1, zero); aR = row_set(aR, -1, zero)
            aB = row_set(aB, -1, zero); aT = row_set(aT, -1, zero)
            aR = row_set(aR, -2, zero)
        elif pin == PIN_BOTTOM:
            aC = col_set(aC, 0, one); aL = col_set(aL, 0, zero); aR = col_set(aR, 0, zero)
            aB = col_set(aB, 0, zero); aT = col_set(aT, 0, zero)
            aB = col_set(aB, 1, zero)
        elif pin == PIN_TOP:
            aC = col_set(aC, -1, one); aL = col_set(aL, -1, zero); aR = col_set(aR, -1, zero)
            aB = col_set(aB, -1, zero); aT = col_set(aT, -1, zero)
            aT = col_set(aT, -2, zero)
        else:
            raise ValueError(f"unknown pin side: {pin}")

    return StencilOp(aC=aC, aL=aL, aR=aR, aB=aB, aT=aT)


def build_pressure_rhs(
    div: jnp.ndarray, dx: float, dy: float, dt, pin: Optional[str] = PIN_NONE,
    periodic_x: bool = False, periodic_y: bool = False,
) -> jnp.ndarray:
    """rhs = -vol * div / dt over the box; pinned edge zeroed, or (singular
    case) the mean subtracted (src/LinearSystem.hpp:125-155).

    ``periodic_x``/``periodic_y``: the velocity BCs of that axis are
    Periodic. Ghost rhs entries on those edges are zeroed before the mean
    subtraction (see the singular branch)."""
    vol = dx * dy
    rhs = -vol * div / dt
    if pin == PIN_LEFT:
        rhs = row_set(rhs, 0, 0.0)
    elif pin == PIN_RIGHT:
        rhs = row_set(rhs, -1, 0.0)
    elif pin == PIN_BOTTOM:
        rhs = col_set(rhs, 0, 0.0)
    elif pin == PIN_TOP:
        rhs = col_set(rhs, -1, 0.0)
    elif pin is PIN_NONE:
        # Mean subtraction makes the singular all-Neumann system compatible
        # (sum(b) = 0). Whatever mean is absorbed here reappears verbatim as
        # a UNIFORM divergence offset on the projected velocity, because the
        # operator's nullspace is the constant vector. Two regimes:
        #   - inflow/outflow (non-periodic) edges: the ghost rhs entries are
        #     FUNCTIONAL — the outflow mass correction operates on the ghost
        #     faces (calc_inflow_outflow, examples/DiffuseIB.cpp:100-110),
        #     so the ghost-cell equations are where the star-flux imbalance
        #     is parked and pushed out through the boundary faces. Keep the
        #     reference's full-box treatment (src/LinearSystem.hpp:148-152).
        #   - periodic edges: the ghost cells are topologically redundant
        #     and their divergence entries are wrap copies that DON'T cancel,
        #     so the reference leaks their mean into a uniform ~1e-3
        #     post-projection divergence (measured, 32^2 TGV). Zero those
        #     ghost entries; the interior sum telescopes to ~0 (with the
        #     shared-face reconciliation in bc.apply_velocity_bcs) and the
        #     projection reaches the CG-residual level (~1e-9). Deviation
        #     documented in PARITY.md.
        if periodic_x:
            rhs = row_set(row_set(rhs, 0, 0.0), -1, 0.0)
        if periodic_y:
            rhs = col_set(col_set(rhs, 0, 0.0), -1, 0.0)
        nx2, ny2 = rhs.shape
        n_support = (nx2 - 2 * periodic_x) * (ny2 - 2 * periodic_y)
        c = jnp.sum(rhs) / n_support
        rhs = rhs - c
        if periodic_x:
            rhs = row_set(row_set(rhs, 0, 0.0), -1, 0.0)
        if periodic_y:
            rhs = col_set(col_set(rhs, 0, 0.0), -1, 0.0)
    else:
        raise ValueError(f"unknown pin side: {pin}")
    return rhs


def apply_op(op: StencilOp, x: jnp.ndarray) -> jnp.ndarray:
    """Matrix-free y = A x with zero-flux box edges (edge coefficients are
    already zero, so plain zero-padded shifts are exact)."""
    xW = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    xE = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    xS = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    xN = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    return op.aC * x + op.aL * xW + op.aR * xE + op.aB * xS + op.aT * xN
