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


# ---------------------------------------------------------------------------
# Reference-example evaluators (examples/MovingLeastSquaresIB.cpp:52-190):
# nearest-neighbor point sampling and the 5-point MLS stencil around it.
# ---------------------------------------------------------------------------
def _nn_index(pos, g0, delta, n):
    """Nearest interior grid index (find_nearest_neighbor,
    examples/MovingLeastSquaresIB.cpp:52-94): clamp to [0, n-1], then pick
    the closer of floor/ceil — equivalent to rounding on a uniform grid."""
    k = jnp.round((pos - g0) / delta).astype(jnp.int32)
    return jnp.clip(k, 0, n - 1)


def eval_field_at_nn(field, x0, dx, y0, dy, px, py):
    """Nearest-neighbor sample of a ghosted field at points (px, py)
    (eval_field_at_nn, examples/MovingLeastSquaresIB.cpp:97-105).
    ``x0``/``y0`` are the first interior coordinates of the field's axes."""
    i = _nn_index(px, x0, dx, field.shape[0] - 2)
    j = _nn_index(py, y0, dy, field.shape[1] - 2)
    return field[i + 1, j + 1]


def eval_field_at_mls5(field, x0, dx, y0, dy, px, py, box_scale=1.2):
    """5-point MLS sample (eval_field_at_sf,
    examples/MovingLeastSquaresIB.cpp:106-190): the nearest node plus its 4
    axis neighbors, weighted by the reference's compact cubic kernel over the
    box-scaled distance r = |p-e|/ (box_scale*d) per axis. The reference
    kernel w(r) = 2/3-4r^2+4r^3 (r<=1/2), 4/3-4r+4r^2-4/3 r^3 (r<=1) is the
    cardinal cubic spline with support 1, i.e. cubic_spline_weight(r, h=1/2).
    """
    ni = field.shape[0] - 2
    nj = field.shape[1] - 2
    inn = _nn_index(px, x0, dx, ni)
    jnn = _nn_index(py, y0, dy, nj)
    di = jnp.asarray([0, -1, 1, 0, 0])
    dj = jnp.asarray([0, 0, 0, -1, 1])
    ii = jnp.clip(inn[..., None] + di, 0, ni - 1)
    jj = jnp.clip(jnn[..., None] + dj, 0, nj - 1)
    sx = x0 + ii * dx
    sy = y0 + jj * dy
    r = jnp.sqrt(
        ((sx - px[..., None]) / (box_scale * dx)) ** 2
        + ((sy - py[..., None]) / (box_scale * dy)) ** 2
    )
    w = cubic_spline_weight(r, 0.5)

    one = jnp.ones_like(sx)
    P = jnp.stack([one, sx, sy], axis=-1)
    A = jnp.einsum("...n,...ni,...nj->...ij", w, P, P)
    pe = jnp.stack([jnp.ones_like(px), px, py], axis=-1)
    sol = jnp.linalg.solve(A, pe[..., None])[..., 0]
    phi = w * jnp.einsum("...ni,...i->...n", P, sol)
    return jnp.sum(phi * field[ii + 1, jj + 1], axis=-1)
