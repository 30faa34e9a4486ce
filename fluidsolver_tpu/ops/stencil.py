"""Staggered-grid stencil operators.

Pure-array re-design of the reference's operator layer
(reference: src/Operators.hpp:10-201). Every routine is a shifted-slice
expression that XLA fuses; no loops, no scatter.

Shape legend (see core/grid.py): center (nx+2, ny+2), U (nx+3, ny+2),
V (nx+2, ny+3); interior = [1:-1, 1:-1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---- staggered -> centered interpolation (src/Operators.hpp:10-29) --------
def interp_u_center(U: jnp.ndarray) -> jnp.ndarray:
    """Ui(i,j) = (U(i,j) + U(i+1,j))/2 over all cells incl. ghosts."""
    return 0.5 * (U[:-1, :] + U[1:, :])


def interp_v_center(V: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (V[:, :-1] + V[:, 1:])


def interp_uv_center(u_stag: jnp.ndarray, v_stag: jnp.ndarray) -> jnp.ndarray:
    """4-point average of a (u-stag, v-stag) pair onto cell centers."""
    return 0.25 * (u_stag[:-1, :] + u_stag[1:, :] + v_stag[:, :-1] + v_stag[:, 1:])


# ---- divergence (src/Operators.hpp:32-41) ---------------------------------
def divergence(U: jnp.ndarray, V: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    """div(i,j) = dU/dx + dV/dy over all cells incl. ghosts."""
    return (U[1:, :] - U[:-1, :]) / dx + (V[:, 1:] - V[:, :-1]) / dy


# ---- Crank-Nicolson midpoint (src/Operators.hpp:44-49) --------------------
def mid_time(curr: jnp.ndarray, old: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (curr + old)


# ---- integrals & norms (src/Operators.hpp:52-82) --------------------------
def integrate(f: jnp.ndarray, dx: float, dy: float, include_ghost: bool = False):
    s = jnp.sum(f) if include_ghost else jnp.sum(f[1:-1, 1:-1])
    return s * dx * dy


def l1_norm(f: jnp.ndarray, dx: float, dy: float, include_ghost: bool = False):
    s = jnp.sum(jnp.abs(f)) if include_ghost else jnp.sum(jnp.abs(f[1:-1, 1:-1]))
    return s * dx * dy


def shift_pressure_to_zero(dp: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    """Gauge fix. NOTE: the reference subtracts the *volume integral* (sum
    times cell volume), not the mean — kept bit-compatible
    (src/Operators.hpp:78-82)."""
    return dp - integrate(dp, dx, dy, include_ghost=True)


# ---- centered gradients with one-sided edge closure -----------------------
def grad_centered(f: jnp.ndarray, dx: float, dy: float):
    """d/dx and d/dy of a cell-centered field over the full ghost box, with
    2nd-order one-sided stencils on the outermost rows/columns
    (src/Operators.hpp:164-201)."""
    dfdx = jnp.zeros_like(f)
    dfdy = jnp.zeros_like(f)

    dfdx = dfdx.at[1:-1, :].set((f[2:, :] - f[:-2, :]) / (2.0 * dx))
    from fluidsolver_tpu.core.fields import row_set

    dfdx = row_set(dfdx, 0, (-3.0 * f[0, :] + 4.0 * f[1, :] - f[2, :]) / (2.0 * dx))
    dfdx = row_set(dfdx, -1, (3.0 * f[-1, :] - 4.0 * f[-2, :] + f[-3, :]) / (2.0 * dx))

    dfdy = dfdy.at[:, 1:-1].set((f[:, 2:] - f[:, :-2]) / (2.0 * dy))
    dfdy = dfdy.at[:, 0].set((-3.0 * f[:, 0] + 4.0 * f[:, 1] - f[:, 2]) / (2.0 * dy))
    dfdy = dfdy.at[:, -1].set((3.0 * f[:, -1] - 4.0 * f[:, -2] + f[:, -3]) / (2.0 * dy))
    return dfdx, dfdy


# ---- point sampling (src/Operators.hpp:118-161) ---------------------------
def sample_centered(field: jnp.ndarray, x0, dx: float, y0, dy: float, px, py):
    """Bilinear sample of a cell-centered ghosted field at points (px, py),
    clamped to the interior (constant extrapolation outside), replicating
    ``eval_flow_field_at``'s index clamping (src/Operators.hpp:128-160).

    ``x0``/``y0`` are the first *interior* center coordinates (xm(0), ym(0));
    the interior has (nx, ny) cells = field.shape - 2.
    """
    nxi = field.shape[0] - 2
    nyi = field.shape[1] - 2

    def indices(pos, g0, delta, n):
        prev = jnp.floor((pos - g0) / delta).astype(jnp.int32)
        nxt = jnp.floor((pos - g0) / delta + 1.0).astype(jnp.int32)
        lo = (pos <= g0) | (prev < 0)
        hi = (pos >= g0 + (n - 1) * delta) | (nxt >= n)
        prev = jnp.where(lo, 0, jnp.where(hi, n - 1, prev))
        nxt = jnp.where(lo, 0, jnp.where(hi, n - 1, nxt))
        return prev, nxt

    ip, inx = indices(px, x0, dx, nxi)
    jp, jnx = indices(py, y0, dy, nyi)

    # logical interior index k -> array index k+1
    f00 = field[ip + 1, jp + 1]
    f10 = field[inx + 1, jp + 1]
    f01 = field[ip + 1, jnx + 1]
    f11 = field[inx + 1, jnx + 1]

    xi = px - (x0 + ip * dx)
    eta = py - (y0 + jp * dy)
    a = (f10 - f00) / dx * xi + f00
    b = (f11 - f01) / dx * xi + f01
    return (b - a) / dy * eta + a


def sample_centered_stack(fields, x0, dx: float, y0, dy: float, px, py,
                          x_clamp=None):
    """``sample_centered`` for a STACK of same-shape fields (F, nx+2, ny+2)
    at the same points: the 4 corner reads of all F fields collapse into ONE
    gather (each separate gather is its own XLA kernel — 8 gathers per RK4
    backtrace become 1 per stage). Per-element arithmetic is identical to
    ``sample_centered``. Returns (F,) + px.shape.

    ``x_clamp``: shard-local view hook (parallel/dist_vof.py). A tuple
    (x0_dom, n_dom, i0_loc): ``fields`` is a local x-slab (extended with
    halo rows) of a GLOBAL array whose interior spans ``n_dom`` cells with
    first center ``x0_dom``; global interior cell 0 sits at local interior
    index ``i0_loc``. The clamp conditions then evaluate against the
    GLOBAL domain (so constant extrapolation at physical boundaries
    matches the single-device sampler), while indices stay local. None =
    single-device behavior (clamp to this array's own extent)."""
    nxi = fields.shape[1] - 2
    nyi = fields.shape[2] - 2

    def indices(pos, g0, delta, n, clamp=None):
        prev = jnp.floor((pos - g0) / delta).astype(jnp.int32)
        nxt = jnp.floor((pos - g0) / delta + 1.0).astype(jnp.int32)
        if clamp is None:
            lo = (pos <= g0) | (prev < 0)
            hi = (pos >= g0 + (n - 1) * delta) | (nxt >= n)
            lo_i, hi_i = 0, n - 1
        else:
            g0d, n_dom, i0 = clamp
            lo = (pos <= g0d) | (prev < i0)
            hi = (pos >= g0d + (n_dom - 1) * delta) | (nxt >= i0 + n_dom)
            lo_i, hi_i = i0, i0 + n_dom - 1
        prev = jnp.where(lo, lo_i, jnp.where(hi, hi_i, prev))
        nxt = jnp.where(lo, lo_i, jnp.where(hi, hi_i, nxt))
        return prev, nxt

    ip, inx = indices(px, x0, dx, nxi, x_clamp)
    jp, jnx = indices(py, y0, dy, nyi)

    I = jnp.stack([ip, inx, ip, inx]) + 1      # (4,) + px.shape
    J = jnp.stack([jp, jp, jnx, jnx]) + 1
    f = fields[:, I, J]                         # (F, 4) + px.shape
    f00, f10, f01, f11 = f[:, 0], f[:, 1], f[:, 2], f[:, 3]

    xi = px - (x0 + ip * dx)
    eta = py - (y0 + jp * dy)
    a = (f10 - f00) / dx * xi + f00
    b = (f11 - f01) / dx * xi + f01
    return (b - a) / dy * eta + a


def sample_centered_stack_lattice(fields, x0, dx: float, y0, dy: float,
                                  px, py):
    """``sample_centered_stack`` for a DENSE lattice of points: gather-free.

    Shape contract: ``px.shape == (nx+1, ny+1)`` with ``fields`` of shape
    ``(F, nx+2, ny+2)``, and point (I, J) lies within one cell of the
    interior corner ``(x0 + (I - 0.5)*dx, y0 + (J - 0.5)*dy)`` — the
    CFL-bounded RK backtrace guarantee (dt*|u| <= cfl*dx < dx,
    ops/momentum.adjust_dt). Under that bound the bilinear corner indices
    land in the STATIC window ``offset in [-2, 1]`` around each point's own
    lattice position, so the 4 corner reads become 0/1-masked sums over 16
    shifted views — bit-identical to the gather form (masks are exact and
    disjoint), but with no gather: data-dependent gathers lower to
    ~1000x-slower scalar loads on TPU and force GSPMD to all-gather the
    full operand on a mesh (the [2,nx+2,ny+2] backtrace all-gather flagged
    by tools/collective_census.py)."""
    F, nx2, ny2 = fields.shape
    nxi, nyi = nx2 - 2, ny2 - 2
    npx, npy = px.shape
    assert (npx, npy) == (nxi + 1, nyi + 1), (px.shape, fields.shape)

    def indices(pos, g0, delta, n):
        prev = jnp.floor((pos - g0) / delta).astype(jnp.int32)
        nxt = jnp.floor((pos - g0) / delta + 1.0).astype(jnp.int32)
        lo = (pos <= g0) | (prev < 0)
        hi = (pos >= g0 + (n - 1) * delta) | (nxt >= n)
        prev = jnp.where(lo, 0, jnp.where(hi, n - 1, prev))
        nxt = jnp.where(lo, 0, jnp.where(hi, n - 1, nxt))
        return prev, nxt

    ip, inx = indices(px, x0, dx, nxi)
    jp, jnx = indices(py, y0, dy, nyi)

    # offsets relative to each point's own lattice index; the CFL bound +
    # edge clamps keep them in [-2, 1] (clamp-to-0 at I<=1, clamp-to-n-1 at
    # I>=n-1 both stay inside)
    II = jax.lax.broadcasted_iota(jnp.int32, px.shape, 0)
    JJ = jax.lax.broadcasted_iota(jnp.int32, px.shape, 1)
    opx, onx = ip - II, inx - II
    opy, ony = jp - JJ, jnx - JJ

    # view(a, b)[f, I, J] = fields[f, I + 1 + a, J + 1 + b] (zeros OOB; the
    # masks never select an out-of-range row/col — corner indices are
    # clamped to the interior)
    padded = jnp.pad(fields, ((0, 0), (1, 1), (1, 1)))

    def view(a, b):
        return jax.lax.slice(
            padded, (0, 2 + a, 2 + b), (F, 2 + a + npx, 2 + b + npy)
        )

    offs = (-2, -1, 0, 1)
    zero = jnp.zeros((F,) + px.shape, fields.dtype)
    f00 = f10 = f01 = f11 = zero
    for a in offs:
        col_p = col_n = zero
        for b in offs:
            v = view(a, b)
            col_p = col_p + jnp.where(opy == b, v, 0)
            col_n = col_n + jnp.where(ony == b, v, 0)
        f00 = f00 + jnp.where(opx == a, col_p, 0)
        f01 = f01 + jnp.where(opx == a, col_n, 0)
        f10 = f10 + jnp.where(onx == a, col_p, 0)
        f11 = f11 + jnp.where(onx == a, col_n, 0)

    xi = px - (x0 + ip * dx)
    eta = py - (y0 + jp * dy)
    a = (f10 - f00) / dx * xi + f00
    b = (f11 - f01) / dx * xi + f01
    return (b - a) / dy * eta + a
