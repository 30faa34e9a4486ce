"""Moving-least-squares interpolation stencils.

Reference: examples/MovingLeastSquaresIB.cpp:106-190 — cubic-spline weight
function + linear-basis MLS shape functions over a small sample stencil
(used there as an interpolation experiment for IB targets)."""

from __future__ import annotations

import jax.numpy as jnp


def cubic_spline_weight(r, h):
    """Standard cardinal cubic-spline kernel with support 2h."""
    q = jnp.abs(r) / h
    w1 = 2.0 / 3.0 - q * q + 0.5 * q * q * q
    w2 = (2.0 - q) ** 3 / 6.0
    return jnp.where(q <= 1.0, w1, jnp.where(q <= 2.0, w2, 0.0))


def mls_shape_functions(px, py, ex, ey, h):
    """MLS shape functions phi_i for samples (px, py) at eval point (ex, ey)
    with linear basis p = [1, x, y]:
        phi_i = p(e)^T (sum_j w_j p_j p_j^T)^{-1} w_i p_i
    Batched over trailing sample axis; 3x3 solve in closed form."""
    r = jnp.sqrt((px - ex[..., None]) ** 2 + (py - ey[..., None]) ** 2)
    w = cubic_spline_weight(r, h)

    one = jnp.ones_like(px)
    P = jnp.stack([one, px, py], axis=-1)  # (..., n, 3)
    A = jnp.einsum("...n,...ni,...nj->...ij", w, P, P)
    pe = jnp.stack([jnp.ones_like(ex), ex, ey], axis=-1)  # (..., 3)
    sol = jnp.linalg.solve(A, pe[..., None])[..., 0]  # A^{-1} p(e)
    return w * jnp.einsum("...ni,...i->...n", P, sol)


def mls_interpolate(px, py, values, ex, ey, h):
    phi = mls_shape_functions(px, py, ex, ey, h)
    return jnp.sum(phi * values, axis=-1)
