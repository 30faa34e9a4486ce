"""Luchini second-order immersed boundary.

Reference: src/IB.hpp:13-186, after Luchini et al. 2025 (JCP 114245).
A per-node correction field lambda = (h - dist)/(dist*h^2) accumulates over
wall-adjacent directions (infinite inside the solid); velocity updates are
either implicit-Euler division or the exact exponential-integrator form.
The lambda fields are precomputed host-side (numpy loop over the few
wall-adjacent nodes); the per-step updates are branchless device code.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.fields import register_pytree_dataclass
from fluidsolver_tpu.core.grid import Grid


@register_pytree_dataclass
@dataclasses.dataclass
class LuchiniIB:
    corr_u: jnp.ndarray  # U-staggered lambda field (inf inside solid)
    corr_v: jnp.ndarray  # V-staggered lambda field


def _correction_field(shape, xs, ys, dx, dy):
    """calc_ib_correction_shape (src/IB.hpp:45-108) on one staggered mesh."""
    nx, ny = len(xs), len(ys)
    corr = np.zeros((nx, ny))
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    solid = np.asarray(shape.contains(X, Y), bool)
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            if solid[i, j]:
                corr[i, j] = np.inf
                continue
            p = (xs[i], ys[j])
            if solid[i + 1, j]:
                ix, _ = shape.intersect_line(p, (xs[i + 1], ys[j]))
                dist = ix - p[0]
                corr[i, j] += (dx - dist) / (dist * dx * dx)
            if solid[i - 1, j]:
                ix, _ = shape.intersect_line(p, (xs[i - 1], ys[j]))
                dist = p[0] - ix
                corr[i, j] += (dx - dist) / (dist * dx * dx)
            if solid[i, j + 1]:
                _, iy = shape.intersect_line(p, (xs[i], ys[j + 1]))
                dist = iy - p[1]
                corr[i, j] += (dy - dist) / (dist * dy * dy)
            if solid[i, j - 1]:
                _, iy = shape.intersect_line(p, (xs[i], ys[j - 1]))
                dist = p[1] - iy
                corr[i, j] += (dy - dist) / (dist * dy * dy)
    return corr


def correction_fields(shape, grid: Grid) -> LuchiniIB:
    # fast path: native C++ sweep for circular walls
    # (fluidsolver_tpu/native/ib_kernels.cpp)
    from fluidsolver_tpu.ib.geometry import Circle as _Circle

    if isinstance(shape, _Circle):
        from fluidsolver_tpu import native

        cu = native.luchini_correction_circle(
            grid.x, grid.ym, grid.dx, grid.dy, shape.x, shape.y, shape.r
        )
        cv = native.luchini_correction_circle(
            grid.xm, grid.y, grid.dx, grid.dy, shape.x, shape.y, shape.r
        )
        if cu is not None and cv is not None:
            return LuchiniIB(corr_u=jnp.asarray(cu), corr_v=jnp.asarray(cv))

    corr_u = _correction_field(shape, grid.x, grid.ym, grid.dx, grid.dy)
    corr_v = _correction_field(shape, grid.xm, grid.y, grid.dx, grid.dy)
    return LuchiniIB(corr_u=jnp.asarray(corr_u), corr_v=jnp.asarray(corr_v))


def _face_visc_u(visc):
    return 0.5 * (visc[1:, 1:-1] + visc[:-1, 1:-1])


def _face_visc_v(visc):
    return 0.5 * (visc[1:-1, 1:] + visc[1:-1, :-1])


def _semi_analytical_coeffs(lam, dt):
    """B = lam*dt/(exp(lam*dt)-1) (-> 1 as lam -> 0), A = lam*dt + B
    (src/IB.hpp:145-151). Branchless with inf-lambda handled by the caller."""
    x = lam * dt
    small = jnp.abs(lam) < 1e-6
    safe = jnp.where(small, 1.0, x)
    B = jnp.where(small, 1.0, safe / jnp.expm1(safe))
    A = x + B
    return A, B


def update_velocity_semi_analytical(
    dmomU, dmomV, dt, ib: LuchiniIB, U_old, V_old, rho_u_old, rho_v_old, rho_u, rho_v, visc, U, V
):
    """Exact exponential-integrator update (src/IB.hpp:129-186):
    U^{n+1} = (B rho_old U_old + dt dmom)/(A rho); U = 0 inside solid."""
    lam_u = _face_visc_u(visc) / rho_u[1:-1, 1:-1] * ib.corr_u[1:-1, 1:-1]
    inside_u = jnp.isinf(lam_u)
    A, B = _semi_analytical_coeffs(jnp.where(inside_u, 0.0, lam_u), dt)
    new_u = (B * rho_u_old[1:-1, 1:-1] * U_old[1:-1, 1:-1] + dt * dmomU[1:-1, 1:-1]) / (
        A * rho_u[1:-1, 1:-1]
    )
    U = U.at[1:-1, 1:-1].set(jnp.where(inside_u, 0.0, new_u))

    lam_v = _face_visc_v(visc) / rho_v[1:-1, 1:-1] * ib.corr_v[1:-1, 1:-1]
    inside_v = jnp.isinf(lam_v)
    A, B = _semi_analytical_coeffs(jnp.where(inside_v, 0.0, lam_v), dt)
    new_v = (B * rho_v_old[1:-1, 1:-1] * V_old[1:-1, 1:-1] + dt * dmomV[1:-1, 1:-1]) / (
        A * rho_v[1:-1, 1:-1]
    )
    V = V.at[1:-1, 1:-1].set(jnp.where(inside_v, 0.0, new_v))
    return U, V


def correct_velocity_implicit_euler(U, V, ib: LuchiniIB, dt, visc, rho_u, rho_v):
    """U /= 1 + dt*nu*lambda (src/IB.hpp:110-127); inf lambda -> 0."""
    nu_u = _face_visc_u(visc) / rho_u[1:-1, 1:-1]
    fac_u = 1.0 + dt * nu_u * ib.corr_u[1:-1, 1:-1]
    U = U.at[1:-1, 1:-1].set(
        jnp.where(jnp.isinf(fac_u), 0.0, U[1:-1, 1:-1] / fac_u)
    )
    nu_v = _face_visc_v(visc) / rho_v[1:-1, 1:-1]
    fac_v = 1.0 + dt * nu_v * ib.corr_v[1:-1, 1:-1]
    V = V.at[1:-1, 1:-1].set(
        jnp.where(jnp.isinf(fac_v), 0.0, V[1:-1, 1:-1] / fac_v)
    )
    return U, V
