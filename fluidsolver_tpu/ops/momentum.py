"""Momentum and density transport on the staggered grid.

Branchless vectorized re-design of the reference's conservative flux-form
RHS with hybrid central/upwind interpolation at density jumps
(reference: src/FS.hpp:131-436). The formulation follows the fused flux
variant (`FS_FUSE_MOM_ALL`, src/FS.hpp:279-293), which is the natural shape
for XLA: each flux is one shifted-slice expression and the compiler fuses the
whole RHS into a couple of passes.

Index mapping (core/grid.py): logical r -> array r+1; corner-mesh arrays have
no ghosts and carry logical (i, j) in [0, nx+1) x [0, ny+1) directly.
"""

from __future__ import annotations

import jax.numpy as jnp



def calc_rho_eps(rho_gas: float, rho_liquid: float) -> float:
    """Density-jump threshold for upwinding (src/FS.hpp:152-155)."""
    return 1e-3 * min(rho_gas, rho_liquid)


def hybrid_interp(rho_eps, rho_m, rho_p, velo_m, velo_p, transp_m, transp_p):
    """Central average, switching to upwind (by transport velocity sign) when
    the density jump exceeds ``rho_eps`` (src/FS.hpp:131-150)."""
    upwind_minus = transp_p + transp_m >= 0.0
    rho_up = jnp.where(upwind_minus, rho_m, rho_p)
    velo_up = jnp.where(upwind_minus, velo_m, velo_p)
    use_up = jnp.abs(rho_p - rho_m) > rho_eps
    rho = jnp.where(use_up, rho_up, 0.5 * (rho_p + rho_m))
    velo = jnp.where(use_up, velo_up, 0.5 * (velo_p + velo_m))
    return rho, velo


def _visc_corner(visc: jnp.ndarray) -> jnp.ndarray:
    """Viscosity averaged to cell corners; corner (i,j) in [0,nx+1)x[0,ny+1)."""
    return 0.25 * (visc[1:, 1:] + visc[:-1, 1:] + visc[1:, :-1] + visc[:-1, :-1])


def _pad1(interior: jnp.ndarray) -> jnp.ndarray:
    """Embed an interior-sized expression into the full array with a
    synthesized ghost ring. pad (not ``.at[1:-1,1:-1].set``): the scatter
    the latter emits partitions worse under GSPMD.

    The ring is zero normally and NaN under FS_NAN_POISON=1 (the
    reference's scratch-poisoning debug mode, src/FS.hpp:163-171): the
    ring is "un-written scratch", and a downstream read of it instead of
    real BC-filled data must trip a NaN, never silently consume a zero."""
    from fluidsolver_tpu.flags import nan_poison

    fill = float("nan") if nan_poison() else 0.0
    return jnp.pad(interior, ((1, 1), (1, 1)), constant_values=fill)


def _set_interior(base: jnp.ndarray, interior: jnp.ndarray) -> jnp.ndarray:
    """base with its interior replaced (ghost ring kept) — scatter-free."""
    import jax

    n, m = base.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    inside = (ii > 0) & (ii < n - 1) & (jj > 0) & (jj < m - 1)
    return jnp.where(inside, _pad1(interior), base)


def calc_dmomdt(
    U: jnp.ndarray,
    V: jnp.ndarray,
    rho_u_old: jnp.ndarray,
    rho_v_old: jnp.ndarray,
    visc: jnp.ndarray,
    p: jnp.ndarray,
    p_jump_u: jnp.ndarray,
    p_jump_v: jnp.ndarray,
    dx: float,
    dy: float,
    rho_eps: float,
):
    """d(rho u)/dt = -div(rho u u) + div(mu grad u) - grad p + p_jump.

    Returns (dmomUdt, dmomVdt) with zero ghost rings (src/FS.hpp:158-315).
    """
    # ---- FXU on the center mesh (src/FS.hpp:180-195) ----------------------
    # FXU = -rho*U^2 + 2*mu*dUdx - p     at every cell of the ghost box
    rho_h, u_h = hybrid_interp(
        rho_eps, rho_u_old[:-1, :], rho_u_old[1:, :], U[:-1, :], U[1:, :], U[:-1, :], U[1:, :]
    )
    u_c = 0.5 * (U[1:, :] + U[:-1, :])
    dudx = (U[1:, :] - U[:-1, :]) / dx
    FXU = -rho_h * u_h * u_c + 2.0 * visc * dudx - p

    # ---- FYU on the corner mesh (src/FS.hpp:198-215) ----------------------
    # FYU = -rho*U*V + mu*(dUdy + dVdx)  at corners (i,j) in [0,nx+1)x[0,ny+1)
    u_lo = U[1:-1, :-1]   # U(i, j-1)
    u_hi = U[1:-1, 1:]    # U(i, j)
    v_lo = V[:-1, 1:-1]   # V(i-1, j)
    v_hi = V[1:, 1:-1]    # V(i, j)
    mu_c = _visc_corner(visc)
    dudy = (u_hi - u_lo) / dy
    dvdx = (v_hi - v_lo) / dx
    rho_h, u_h = hybrid_interp(
        rho_eps, rho_u_old[1:-1, :-1], rho_u_old[1:-1, 1:], u_lo, u_hi, v_lo, v_hi
    )
    FYU = -rho_h * u_h * 0.5 * (v_lo + v_hi) + mu_c * (dudy + dvdx)

    # ---- FXV on the corner mesh (src/FS.hpp:218-235) ----------------------
    rho_h, v_h = hybrid_interp(
        rho_eps, rho_v_old[:-1, 1:-1], rho_v_old[1:, 1:-1], v_lo, v_hi, u_lo, u_hi
    )
    FXV = -rho_h * v_h * 0.5 * (u_lo + u_hi) + mu_c * (dudy + dvdx)

    # ---- FYV on the center mesh (src/FS.hpp:238-254) ----------------------
    rho_h, v_h = hybrid_interp(
        rho_eps, rho_v_old[:, :-1], rho_v_old[:, 1:], V[:, :-1], V[:, 1:], V[:, :-1], V[:, 1:]
    )
    v_c = 0.5 * (V[:, 1:] + V[:, :-1])
    dvdy = (V[:, 1:] - V[:, :-1]) / dy
    FYV = -rho_h * v_h * v_c + 2.0 * visc * dvdy - p

    # ---- flux differences (src/FS.hpp:281-292) ----------------------------
    dmomU = _pad1(
        (FXU[1:, 1:-1] - FXU[:-1, 1:-1]) / dx
        + (FYU[:, 1:] - FYU[:, :-1]) / dy
        + p_jump_u[1:-1, 1:-1]
    )

    dmomV = _pad1(
        (FXV[1:, :] - FXV[:-1, :]) / dx
        + (FYV[1:-1, 1:] - FYV[1:-1, :-1]) / dy
        + p_jump_v[1:-1, 1:-1]
    )
    return dmomU, dmomV


def calc_drhodt(
    U: jnp.ndarray,
    V: jnp.ndarray,
    rho_u_old: jnp.ndarray,
    rho_v_old: jnp.ndarray,
    dx: float,
    dy: float,
    rho_eps: float,
):
    """Consistent mass/density transport with the same hybrid fluxes
    (src/FS.hpp:318-406). Returns (drho_u_dt, drho_v_dt), zero ghosts."""
    zero = jnp.zeros(())

    # FXU = -rho*U on the center mesh
    rho_h, _ = hybrid_interp(
        rho_eps, rho_u_old[:-1, :], rho_u_old[1:, :], zero, zero, U[:-1, :], U[1:, :]
    )
    FXU = -rho_h * 0.5 * (U[:-1, :] + U[1:, :])

    # FYU = -rho*V on the corner mesh
    u_lo, u_hi = U[1:-1, :-1], U[1:-1, 1:]
    v_lo, v_hi = V[:-1, 1:-1], V[1:, 1:-1]
    rho_h, _ = hybrid_interp(rho_eps, rho_u_old[1:-1, :-1], rho_u_old[1:-1, 1:], zero, zero, v_lo, v_hi)
    FYU = -rho_h * 0.5 * (v_lo + v_hi)

    drho_u = _pad1(
        (FXU[1:, 1:-1] - FXU[:-1, 1:-1]) / dx + (FYU[:, 1:] - FYU[:, :-1]) / dy
    )

    # FXV = -rho*U on the corner mesh
    rho_h, _ = hybrid_interp(rho_eps, rho_v_old[:-1, 1:-1], rho_v_old[1:, 1:-1], zero, zero, u_lo, u_hi)
    FXV = -rho_h * 0.5 * (u_lo + u_hi)

    # FYV = -rho*V on the center mesh
    rho_h, _ = hybrid_interp(
        rho_eps, rho_v_old[:, :-1], rho_v_old[:, 1:], zero, zero, V[:, :-1], V[:, 1:]
    )
    FYV = -rho_h * 0.5 * (V[:, :-1] + V[:, 1:])

    drho_v = _pad1(
        (FXV[1:, :] - FXV[:-1, :]) / dx + (FYV[1:-1, 1:] - FYV[1:-1, :-1]) / dy
    )
    return drho_u, drho_v


def update_velocity(U_old, V_old, rho_u_old, rho_v_old, rho_u, rho_v, dmomU, dmomV, dt, U, V):
    """U = (rho_old*U_old + dt*dmomUdt)/rho  on the interior (src/FS.hpp:423-436)."""
    U = _set_interior(
        U,
        (rho_u_old[1:-1, 1:-1] * U_old[1:-1, 1:-1] + dt * dmomU[1:-1, 1:-1]) / rho_u[1:-1, 1:-1],
    )
    V = _set_interior(
        V,
        (rho_v_old[1:-1, 1:-1] * V_old[1:-1, 1:-1] + dt * dmomV[1:-1, 1:-1]) / rho_v[1:-1, 1:-1],
    )
    return U, V


def update_density(rho_u_old, rho_v_old, drho_u, drho_v, dt, rho_u, rho_v):
    """rho = rho_old + dt*drhodt on the interior (src/FS.hpp:409-420)."""
    rho_u = _set_interior(rho_u, rho_u_old[1:-1, 1:-1] + dt * drho_u[1:-1, 1:-1])
    rho_v = _set_interior(rho_v, rho_v_old[1:-1, 1:-1] + dt * drho_v[1:-1, 1:-1])
    return rho_u, rho_v


# ---- two-phase property mixing (src/FS.hpp:594-650) -----------------------
def mix_rho_staggered(vf: jnp.ndarray, rho_gas: float, rho_liquid: float, rho_u, rho_v):
    """Linear-by-volume-fraction density, averaged onto the staggered faces;
    ghost ring by Neumann fill (src/FS.hpp:594-612)."""
    from fluidsolver_tpu.core.bc import apply_neumann_scalar

    rho_c = vf * rho_liquid + (1.0 - vf) * rho_gas
    # pad (not .at[].set): the Neumann fill rewrites the whole ghost ring
    # anyway, and interior scatters force GSPMD full-field all-gathers
    # (core/fields.set_interior)
    rho_u = apply_neumann_scalar(jnp.pad(
        0.5 * (rho_c[:-1, :] + rho_c[1:, :])[:, 1:-1], ((1, 1), (1, 1))))
    rho_v = apply_neumann_scalar(jnp.pad(
        0.5 * (rho_c[:, :-1] + rho_c[:, 1:])[1:-1, :], ((1, 1), (1, 1))))
    return rho_u, rho_v


def mix_visc(vf: jnp.ndarray, visc_gas: float, visc_liquid: float, arithmetic: bool = False):
    """Harmonic (default) or arithmetic viscosity mixing on cell centers with
    the VF_LOW/VF_HIGH pure-phase cutoffs; Neumann ghost fill
    (src/FS.hpp:615-650)."""
    from fluidsolver_tpu.core.bc import apply_neumann_scalar

    if arithmetic:
        visc = vf * visc_liquid + (1.0 - vf) * visc_gas
    else:
        from fluidsolver_tpu.constants import vf_cutoffs

        lo, hi = vf_cutoffs(vf.dtype)
        harmonic = (visc_liquid * visc_gas) / (visc_liquid * (1.0 - vf) + visc_gas * vf)
        visc = jnp.where(vf < lo, visc_gas, jnp.where(vf > hi, visc_liquid, harmonic))
    return apply_neumann_scalar(visc)


# ---- surface tension as a staggered pressure jump (src/FS.hpp:439-466) ----
def calc_pressure_jump(vf, curv, interface_length, sigma: float, dx: float, dy: float, p_jump_u, p_jump_v):
    """p_jump = sigma * kappa_face * grad(vf), with the face curvature taken
    as the interface-length-weighted average of the two adjacent cells."""
    lm = interface_length[:-1, 1:-1]
    lp = interface_length[1:, 1:-1]
    total = lm + lp
    curv_face = jnp.where(
        total > 0.0, (curv[1:, 1:-1] * lp + curv[:-1, 1:-1] * lm) / jnp.where(total > 0.0, total, 1.0), 0.0
    )
    p_jump_u = jnp.pad(
        sigma * curv_face * (vf[1:, 1:-1] - vf[:-1, 1:-1]) / dx,
        ((1, 1), (1, 1)),
    )

    lm = interface_length[1:-1, :-1]
    lp = interface_length[1:-1, 1:]
    total = lm + lp
    curv_face = jnp.where(
        total > 0.0, (curv[1:-1, 1:] * lp + curv[1:-1, :-1] * lm) / jnp.where(total > 0.0, total, 1.0), 0.0
    )
    p_jump_v = jnp.pad(
        sigma * curv_face * (vf[1:-1, 1:] - vf[1:-1, :-1]) / dy,
        ((1, 1), (1, 1)),
    )
    return p_jump_u, p_jump_v


# ---- surface tension as explicit tangential forces (src/FS.hpp:469-566) ---
def calc_surface_tension_force(rec_nx, rec_ny, valid, sigma: float, f_sigma_u, f_sigma_v):
    """Explicit tangent-force surface tension — the reference's alternative
    capillary model (src/FS.hpp:469-566, consumed by the disabled branch in
    examples/TwoPhaseSolver.cpp:348-355).

    At each face whose two neighbor cells BOTH carry a PLIC reconstruction,
    the interface pulls on the face with magnitude ``sigma`` along each
    cell's interface tangent ``t = rot90(n) = (-n_y, n_x)``, the left/bottom
    tangent oriented away from the face in ``-x``/``-y`` and the right/top
    tangent in ``+x``/``+y`` (the sign flips at src/FS.hpp:511-521/553-563).
    The stored face value is the face-normal component of the net pull,
    ``sigma * (t_right - t_left)``.

    ``rec_nx``/``rec_ny``: unit PLIC normals on the full ghost box;
    ``valid``: interior-mixed mask (the reference's ``has_interface`` gate).
    ``f_sigma_u``/``f_sigma_v`` are shape/dtype templates (U/V staggered).
    """
    tx = -rec_ny  # tangent = rot90(normal) (src/FS.hpp:479-481)
    ty = rec_nx

    # U faces: x-component of (right tangent - left tangent)
    both = valid[:-1, 1:-1] & valid[1:, 1:-1]
    t_left = jnp.where(tx[:-1, 1:-1] > 0.0, -tx[:-1, 1:-1], tx[:-1, 1:-1])
    t_right = jnp.where(tx[1:, 1:-1] < 0.0, -tx[1:, 1:-1], tx[1:, 1:-1])
    f_sigma_u = jnp.pad(
        jnp.where(both, sigma * (t_right - t_left), 0.0), ((1, 1), (1, 1))
    ).astype(f_sigma_u.dtype)

    # V faces: y-component of (top tangent - bottom tangent)
    both = valid[1:-1, :-1] & valid[1:-1, 1:]
    t_bot = jnp.where(ty[1:-1, :-1] > 0.0, -ty[1:-1, :-1], ty[1:-1, :-1])
    t_top = jnp.where(ty[1:-1, 1:] < 0.0, -ty[1:-1, 1:], ty[1:-1, 1:])
    f_sigma_v = jnp.pad(
        jnp.where(both, sigma * (t_top - t_bot), 0.0), ((1, 1), (1, 1))
    ).astype(f_sigma_v.dtype)
    return f_sigma_u, f_sigma_v


# ---- CFL time-step controller (src/FS.hpp:100-128) ------------------------
def adjust_dt(
    U, V, rho_u, rho_v, visc, dx: float, dy: float,
    rho_gas: float, rho_liquid: float, sigma: float,
    cfl_max: float, dt_max: float,
):
    """Convective + viscous + capillary (Popinet 2018 / NGA2) CFL limit."""
    if sigma > 0.0:
        cfl_st = 1.0 / jnp.sqrt(
            ((rho_gas + rho_liquid) * (dx * dy) ** 1.5) / (4.0 * jnp.pi * sigma)
        )
    else:
        cfl_st = 0.0

    u_c = 0.5 * (U[1:-2, 1:-1] + U[2:-1, 1:-1])
    v_c = 0.5 * (V[1:-1, 1:-2] + V[1:-1, 2:-1])
    cfl_cx = jnp.maximum(jnp.max(u_c) / dx, 0.0)
    cfl_cy = jnp.maximum(jnp.max(v_c) / dy, 0.0)

    rho_c = 0.25 * (
        rho_u[1:-2, 1:-1] + rho_u[2:-1, 1:-1] + rho_v[1:-1, 1:-2] + rho_v[1:-1, 2:-1]
    )
    cfl_vx = jnp.maximum(jnp.max(4.0 * visc[1:-1, 1:-1] / (dx * dx * rho_c)), 0.0)
    cfl_vy = jnp.maximum(jnp.max(4.0 * visc[1:-1, 1:-1] / (dy * dy * rho_c)), 0.0)

    cfl = jnp.maximum(jnp.maximum(cfl_cx, cfl_cy), jnp.maximum(cfl_vx, cfl_vy))
    cfl = jnp.maximum(cfl, cfl_st)
    return jnp.minimum(cfl_max / cfl, dt_max)


# ---- conserved-quantity diagnostics (src/FS.hpp:653-676) ------------------
def conserved_quantities(U, V, rho_u, rho_v, dx: float, dy: float):
    vol = dx * dy
    mass = jnp.sum(
        0.25 * (rho_u[1:-2, 1:-1] + rho_u[2:-1, 1:-1] + rho_v[1:-1, 1:-2] + rho_v[1:-1, 2:-1])
    ) * vol
    mom_x = jnp.sum(
        0.5 * (rho_u[1:-2, 1:-1] * U[1:-2, 1:-1] + rho_u[2:-1, 1:-1] * U[2:-1, 1:-1])
    ) * vol
    mom_y = jnp.sum(
        0.5 * (rho_v[1:-1, 1:-2] * V[1:-1, 1:-2] + rho_v[1:-1, 2:-1] * V[1:-1, 2:-1])
    ) * vol
    return mass, mom_x, mom_y


# ---- outflow mass correction (examples/IncompSolver.cpp:72-83, 189-193) ---
def inflow_outflow(U, rho_u):
    inflow = jnp.sum(rho_u[0, :] * U[0, :])
    outflow = jnp.sum(rho_u[-1, :] * U[-1, :])
    return inflow, outflow, outflow - inflow


def correct_outflow(U, rho_u, mass_error):
    ncols = U.shape[1]
    from fluidsolver_tpu.core.fields import row_add

    return row_add(U, -1, -mass_error / (rho_u[-1, :] * ncols))
