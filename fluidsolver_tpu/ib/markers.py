"""Lagrangian-marker immersed interface.

Reference: examples/II.cpp:77-159 — a closed ring of markers carrying an
elastic response force F = K*(X0 - X) - eta*U and the pressure/viscous-
stress jump conditions computed from marker normals. Marker velocities come
from clamped-bilinear sampling; markers advect with the flow.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fluidsolver_tpu.core.fields import register_pytree_dataclass
from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.ops.stencil import sample_centered


@register_pytree_dataclass
@dataclasses.dataclass
class Markers:
    x0: jnp.ndarray
    y0: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def init_circle(n: int, cx: float, cy: float, r: float, dtype=None) -> Markers:
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, n, endpoint=False).astype(dtype)
    x = cx + r * jnp.cos(theta)
    y = cy + r * jnp.sin(theta)
    z = jnp.zeros_like(x)
    return Markers(x0=x, y0=y, x=x, y=y, u=z, v=z)


def sample_velocity(m: Markers, Ui, Vi, grid: Grid) -> Markers:
    u = sample_centered(Ui, grid.xm[1], grid.dx, grid.ym[1], grid.dy, m.x, m.y)
    v = sample_centered(Vi, grid.xm[1], grid.dx, grid.ym[1], grid.dy, m.x, m.y)
    return dataclasses.replace(m, u=u, v=v)


def advect(m: Markers, dt) -> Markers:
    return dataclasses.replace(m, x=m.x + dt * m.u, y=m.y + dt * m.v)


def response_force(m: Markers, kappa: float, eta: float):
    """F = K*(X0 - X) - eta*U (II.cpp:110-116)."""
    return kappa * (m.x0 - m.x) - eta * m.u, kappa * (m.y0 - m.y) - eta * m.v


def marker_normals(m: Markers):
    """Averaged edge normals of the closed marker ring (II.cpp:118-144)."""
    def seg_normal(dx, dy):
        n = jnp.sqrt(dx * dx + dy * dy)
        return -dy / n, dx / n

    t1x = m.x - jnp.roll(m.x, 1)
    t1y = m.y - jnp.roll(m.y, 1)
    t2x = jnp.roll(m.x, -1) - m.x
    t2y = jnp.roll(m.y, -1) - m.y
    n1x, n1y = seg_normal(t1x, t1y)
    n2x, n2y = seg_normal(t2x, t2y)
    return 0.5 * (n1x + n2x), 0.5 * (n1y + n2y)


def jump_conditions(m: Markers, kappa: float, eta: float):
    """Pressure and viscous-stress jumps from the response force
    (II.cpp:118-159, J^{-1} = 1)."""
    fu, fv = response_force(m, kappa, eta)
    nx, ny = marker_normals(m)
    p_jump = fu * nx + fv * ny
    mu_dudx = ((1.0 - nx * nx) * fu + (1.0 - nx * ny) * fv) * nx
    mu_dvdx = ((1.0 - nx * ny) * fu + (1.0 - ny * ny) * fv) * nx
    mu_dudy = ((1.0 - nx * nx) * fu + (1.0 - nx * ny) * fv) * ny
    mu_dvdy = ((1.0 - nx * ny) * fu + (1.0 - ny * ny) * fv) * ny
    return dict(
        p_jump=p_jump, mu_dudx_jump=mu_dudx, mu_dvdx_jump=mu_dvdx,
        mu_dudy_jump=mu_dudy, mu_dvdy_jump=mu_dvdy,
    )


def spread_force(m: Markers, fu, fv, grid: Grid, u_shape, v_shape):
    """Spread marker forces to the staggered grid with the 4-point Peskin
    cosine delta (a regularized-delta forcing alternative to the jump
    formulation; the reference's II case stops at the jump conditions)."""
    def delta(r, h):
        q = jnp.abs(r) / h
        return jnp.where(q < 2.0, 0.25 / h * (1.0 + jnp.cos(jnp.pi * q / 2.0)), 0.0)

    ds = 2.0 * jnp.pi * jnp.sqrt((m.x0[0] - m.x0.mean()) ** 2 + (m.y0[0] - m.y0.mean()) ** 2) / m.x.shape[0]

    fU = jnp.zeros(u_shape, m.x.dtype)
    xf = jnp.asarray(grid.x, m.x.dtype)
    ymc = jnp.asarray(grid.ym, m.x.dtype)
    wx = delta(xf[:, None] - m.x[None, :], grid.dx)      # (nx+3, n)
    wy = delta(ymc[:, None] - m.y[None, :], grid.dy)     # (ny+2, n)
    fU = jnp.einsum("in,jn,n->ij", wx, wy, fu * ds)

    xmc = jnp.asarray(grid.xm, m.x.dtype)
    yf = jnp.asarray(grid.y, m.x.dtype)
    wx = delta(xmc[:, None] - m.x[None, :], grid.dx)
    wy = delta(yf[:, None] - m.y[None, :], grid.dy)
    fV = jnp.einsum("in,jn,n->ij", wx, wy, fv * ds)
    return fU, fV
