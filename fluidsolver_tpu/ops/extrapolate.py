"""Divergence-free velocity extrapolation.

Completes what the reference left unfinished: examples/
DivFreeExtrapolation.cpp sets a velocity field inside a region and ends
with ``TODO: Implement the divergence-free extrapolation of the velocity
field`` (examples/DivFreeExtrapolation.cpp:94). This module implements it:

1. ``constant_extrapolate`` — fill unknown staggered values by repeated
   nearest-neighbor averaging (the masked-Jacobi analog of Aslam-style
   constant extrapolation; known values are pinned).
2. ``project_div_free`` — one masked pressure projection: solve
   ``-div(mask * grad(phi)) = -div(U)`` by CG where only the UNKNOWN faces
   are correctable, then ``U -= mask_u * dphi/dx`` (same for V). Every cell
   touching at least one unknown face ends exactly divergence-free (to the
   CG tolerance); the known region is never modified.

Both are pure jittable functions; the CG runs in ``lax.while_loop`` (no
host sync), mirroring poisson/cg.py's conventions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.ops import stencil


def constant_extrapolate(f: jnp.ndarray, known: jnp.ndarray, n_sweeps: int):
    """Fill ``f`` where ``~known`` by iterated 4-neighbor averaging over
    already-available values; known entries are never changed. ``n_sweeps``
    bounds the fill distance (one cell per sweep) — use >= max(nx, ny) to
    guarantee full coverage from any seed region."""
    known = known.astype(f.dtype)
    f = f * known  # poison-free start: unknown entries contribute 0

    def shift_sum(a):
        s = jnp.zeros_like(a)
        s = s.at[1:, :].add(a[:-1, :]).at[:-1, :].add(a[1:, :])
        s = s.at[:, 1:].add(a[:, :-1]).at[:, :-1].add(a[:, 1:])
        return s

    def sweep(_, carry):
        g, avail = carry
        nb_sum = shift_sum(g * avail)
        nb_cnt = shift_sum(avail)
        fill = nb_sum / jnp.where(nb_cnt > 0, nb_cnt, 1.0)
        g_new = jnp.where(known > 0, g, jnp.where(nb_cnt > 0, fill, g))
        avail_new = jnp.maximum(avail, (nb_cnt > 0).astype(avail.dtype))
        return g_new, avail_new

    out, _ = lax.fori_loop(0, n_sweeps, sweep, (f, known))
    return out


def project_div_free(U, V, known_u, known_v, grid: Grid, tol: float = 1e-10,
                     max_iter: int = 2000, seal_boundary: bool = False):
    """Correct the UNKNOWN faces of (U, V) so that every cell with at least
    one unknown face becomes divergence-free; known faces are untouched.

    Returns ``(U, V, rel_residual, iters)``.

    ``seal_boundary=False`` (default): unknown faces ON the domain boundary
    are correctable too — mass may leave the domain, the ghost cells act as
    a zero-Dirichlet anchor, and the masked operator ``-div(mask grad)`` is
    SPD: every active cell ends EXACTLY divergence-free (to ``tol``).
    ``seal_boundary=True``: boundary faces are pinned (BCs own them); the
    operator is then all-Neumann/singular and the constant nullspace is
    projected out — the result is div-free up to the discrete
    incompatibility of the known data (the net known-face flux into the
    unknown region, spread uniformly)."""
    dx, dy = grid.dx, grid.dy
    mask_u = 1.0 - known_u.astype(U.dtype)
    mask_v = 1.0 - known_v.astype(V.dtype)
    # ghost faces are never corrected; boundary faces only if not sealed
    b_lo = 2 if seal_boundary else 1
    mask_u = mask_u.at[:b_lo, :].set(0.0).at[-b_lo:, :].set(0.0)
    mask_u = mask_u.at[:, 0].set(0.0).at[:, -1].set(0.0)
    mask_v = mask_v.at[:, :b_lo].set(0.0).at[:, -b_lo:].set(0.0)
    mask_v = mask_v.at[0, :].set(0.0).at[-1, :].set(0.0)

    # active rows: interior cells adjacent to >=1 correctable face
    touch = (mask_u[1:, :] > 0) | (mask_u[:-1, :] > 0) | (
        mask_v[:, 1:] > 0) | (mask_v[:, :-1] > 0)
    interior = jnp.zeros_like(touch).at[1:-1, 1:-1].set(True)
    active = touch & interior

    def A(phi):
        fx = mask_u[1:-1, :] * (phi[1:, :] - phi[:-1, :]) / dx  # interior u faces
        fy = mask_v[:, 1:-1] * (phi[:, 1:] - phi[:, :-1]) / dy
        lap = jnp.zeros_like(phi)
        lap = lap.at[1:-1, :].add((fx[1:, :] - fx[:-1, :]) / dx)
        lap = lap.at[:, 1:-1].add((fy[:, 1:] - fy[:, :-1]) / dy)
        return jnp.where(active, -lap, phi)

    def proj(v):
        # sealed mode: all-Neumann on the active set -> remove the constant
        # nullspace component (v vanishes off-active, so sum(v) is the
        # active sum)
        if not seal_boundary:
            return v
        n_act = jnp.maximum(jnp.sum(active), 1)
        return jnp.where(active, v - jnp.sum(v) / n_act, v)

    div = stencil.divergence(U, V, dx, dy)
    b = proj(jnp.where(active, -div, 0.0))
    b_norm = jnp.sqrt(jnp.sum(b * b))
    safe = jnp.where(b_norm > 0, b_norm, 1.0)

    def cond(c):
        _, r, p, rs, k = c
        return (k < max_iter) & (jnp.sqrt(rs) / safe > tol)

    def body(c):
        x, r, p, rs, k = c
        Ap = proj(A(p))
        alpha = rs / jnp.sum(p * Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    x0 = jnp.zeros_like(b)
    phi, r, _, rs, iters = lax.while_loop(
        cond, body, (x0, b, b, jnp.sum(b * b), 0)
    )
    rel = jnp.sqrt(rs) / safe

    U = U.at[1:-1, :].add(-mask_u[1:-1, :] * (phi[1:, :] - phi[:-1, :]) / dx)
    V = V.at[:, 1:-1].add(-mask_v[:, 1:-1] * (phi[:, 1:] - phi[:, :-1]) / dy)
    return U, V, rel, iters


def div_free_extrapolate(U, V, known_u, known_v, grid: Grid,
                         n_sweeps: int = None, tol: float = 1e-10,
                         max_iter: int = 2000, seal_boundary: bool = False):
    """Extrapolate (U, V) from the known faces outward, divergence-free:
    constant extrapolation seeds the unknown faces, one masked projection
    makes them solenoidal. Returns ``(U, V, rel_residual, iters)``."""
    if n_sweeps is None:
        n_sweeps = max(U.shape[0], U.shape[1])
    U = constant_extrapolate(U, known_u, n_sweeps)
    V = constant_extrapolate(V, known_v, n_sweeps)
    return project_div_free(U, V, known_u, known_v, grid, tol, max_iter,
                            seal_boundary)
