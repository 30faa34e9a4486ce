"""Single-phase incompressible fractional-step solver.

The canonical constant-density time step (reference:
examples/IncompSolver.cpp:163-210): adaptive CFL dt, state rotation, then
``num_subiter`` subiterations of { Crank-Nicolson midpoint -> momentum RHS ->
velocity update -> BCs -> optional outflow correction -> divergence ->
pressure Poisson solve -> gauge shift -> projection }.

The whole step (including the PCG pressure solve) is one jittable pure
function ``state -> state``; the host loop only reads back ``t``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from fluidsolver_tpu.core import bc as bc_mod
from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.ops import momentum as mom
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.poisson import cg, linsys
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.solvers.state import (FlowState, clamp_dt_to_end,
                                            end_tolerance, save_old)


def pressure_solve(state: FlowState, div, dt, grid: Grid, cfg: SolverConfig,
                   x0=None, levels=None, tol=None, mesh=None):
    """Assemble + PCG-solve the pressure Poisson system; returns the gauge-
    shifted increment delta_p and solver stats. ``x0``: optional warm-start
    guess; ``levels``: optional prebuilt MG hierarchy (see cg.solve_pcg /
    cg.build_precond_levels); ``tol``: overrides cfg.pressure_tol (may be a
    traced scalar — cfg.pressure_tol_intermediate plumbing); ``mesh``: a 1D
    x-slab jax.sharding.Mesh — routes the solve through the PRODUCTION
    distributed BoxMG-PCG (parallel/dist_poisson.py, explicit shard_map with
    ICI halo exchange) instead of the single-device solver."""
    if tol is None:
        tol = cfg.pressure_tol
    op = linsys.assemble_pressure_operator(
        state.rho_u, state.rho_v, grid.dx, grid.dy, cfg.pressure_pin
    )
    per_x = isinstance(cfg.bcs.left, bc_mod.Periodic) and isinstance(
        cfg.bcs.right, bc_mod.Periodic
    )
    per_y = isinstance(cfg.bcs.bottom, bc_mod.Periodic) and isinstance(
        cfg.bcs.top, bc_mod.Periodic
    )
    rhs = linsys.build_pressure_rhs(
        div, grid.dx, grid.dy, dt, cfg.pressure_pin,
        periodic_x=per_x, periodic_y=per_y,
    )
    singular = cfg.pressure_pin is None
    if mesh is not None:
        if cfg.pressure_method != "pcg":
            raise ValueError(
                "multi-chip pressure solve supports pressure_method='pcg' "
                f"only (got {cfg.pressure_method!r})")
        from fluidsolver_tpu.parallel import dist_poisson

        delta_p, rel, iters = dist_poisson.solve_pcg_sharded(
            mesh, op, rhs, tol=tol, max_iter=cfg.pressure_max_iter,
            singular=singular, n_pre=cfg.mg_pre, n_post=cfg.mg_post,
            x0=x0 if cfg.pressure_warm_start else None,
            levels=levels,
        )
        delta_p = stencil.shift_pressure_to_zero(delta_p, grid.dx, grid.dy)
        return delta_p, rel, iters
    if cfg.pressure_solver == "direct":
        from fluidsolver_tpu.poisson.direct import solve_direct

        delta_p = solve_direct(op, rhs, singular)
        rel = jnp.zeros((), rhs.dtype)
        iters = jnp.ones((), jnp.int32)
    else:
        precond_dtype = (
            jnp.dtype(cfg.pressure_precond_dtype)
            if cfg.pressure_precond_dtype is not None else None
        )
        if cfg.pressure_method == "pcg":
            delta_p, rel, iters = cg.solve_pcg(
                op,
                rhs,
                tol=tol,
                max_iter=cfg.pressure_max_iter,
                singular=singular,
                precond=cfg.pressure_solver,
                n_pre=cfg.mg_pre,
                n_post=cfg.mg_post,
                precond_dtype=precond_dtype,
                x0=x0,
                levels=levels,
            )
        else:
            # reference solver-enum parity (GMRES/BiCGSTAB/SMG-or-PFMG-as-
            # solver, src/HYPREUtility.hpp:35-36) — see poisson/krylov.py
            from fluidsolver_tpu.poisson import krylov

            if cfg.pressure_method == "mgsolve" and cfg.pressure_solver not in (
                "mg", "boxmg"
            ):
                raise ValueError(
                    "pressure_method='mgsolve' needs pressure_solver in "
                    "{'mg','boxmg'} (the V-cycle IS the solver)"
                )
            M_inv, _ = cg.make_m_inv(
                op, rhs.dtype, cfg.pressure_solver, levels=levels,
                n_pre=cfg.mg_pre, n_post=cfg.mg_post,
                precond_dtype=precond_dtype,
            )
            common = dict(
                tol=tol, max_iter=cfg.pressure_max_iter,
                singular=singular, M_inv=M_inv, x0=x0,
            )
            if cfg.pressure_method == "bicgstab":
                delta_p, rel, iters = krylov.solve_bicgstab(op, rhs, **common)
            elif cfg.pressure_method == "gmres":
                delta_p, rel, iters = krylov.solve_gmres(
                    op, rhs, restart=cfg.pressure_gmres_restart, **common
                )
            elif cfg.pressure_method == "mgsolve":
                delta_p, rel, iters = krylov.solve_mg(op, rhs, **common)
            else:
                raise ValueError(
                    f"unknown pressure_method: {cfg.pressure_method!r}"
                )
    delta_p = stencil.shift_pressure_to_zero(delta_p, grid.dx, grid.dy)
    return delta_p, rel, iters


def build_step_levels(rho_u, rho_v, grid: Grid, cfg: SolverConfig):
    """Per-step MG hierarchy from the step-start densities (hoisted out of
    the subiteration loop; the preconditioner lags the density transport by
    at most one step, which PCG tolerates — cg.build_precond_levels)."""
    if cfg.pressure_solver not in ("mg", "boxmg"):
        return None
    op = linsys.assemble_pressure_operator(
        rho_u, rho_v, grid.dx, grid.dy, cfg.pressure_pin
    )
    pd = (
        jnp.dtype(cfg.pressure_precond_dtype)
        if cfg.pressure_precond_dtype is not None else None
    )
    return cg.build_precond_levels(op, cfg.pressure_solver, pd)


def build_step_levels_sharded(rho_u, rho_v, grid: Grid, cfg: SolverConfig,
                              mesh):
    """Mesh analog of build_step_levels: the distributed hierarchy pair
    (dist_poisson.build_hierarchy_sharded) from the step-start densities,
    reused across the subiteration solves via solve_pcg_sharded(levels=)."""
    if cfg.pressure_solver not in ("mg", "boxmg"):
        return None
    op = linsys.assemble_pressure_operator(
        rho_u, rho_v, grid.dx, grid.dy, cfg.pressure_pin
    )
    from fluidsolver_tpu.parallel import dist_poisson

    return dist_poisson.build_hierarchy_sharded(mesh, op)


def project_velocity(U, V, delta_p, rho_u, rho_v, dt, dx: float, dy: float):
    """U -= dt/rho * grad(delta_p) on interior faces
    (examples/TwoPhaseSolver.cpp:369-378)."""
    from fluidsolver_tpu.core.fields import add_interior

    # add_interior (pad+add), not .at[].add: interior scatters make GSPMD
    # all-gather the full field (core/fields.set_interior)
    dpdx = (delta_p[1:, 1:-1] - delta_p[:-1, 1:-1]) / dx
    U = add_interior(U, -dpdx * dt / rho_u[1:-1, 1:-1])
    dpdy = (delta_p[1:-1, 1:] - delta_p[1:-1, :-1]) / dy
    V = add_interior(V, -dpdy * dt / rho_v[1:-1, 1:-1])
    return U, V


def make_step(grid: Grid, cfg: SolverConfig, ib=None, div_source=None):
    """Build the jitted single-phase step(state, t_end) -> state.

    ``ib``: precomputed immersed-boundary fields matching ``cfg.ib_mode``
    (ib.diffuse.DiffuseIB / ib.sharp.SharpIB / ib.luchini.LuchiniIB).
    ``div_source``: optional callable (state, dt) -> cell-centered array
    added to the divergence before the pressure solve — the hook used by the
    GrowingIB / ExpandingBubble mass sources (examples/GrowingIB.cpp:93-100).
    """
    rho_eps = mom.calc_rho_eps(cfg.rho_gas, cfg.rho_liquid)
    if cfg.ib_mode is not None and ib is None:
        raise ValueError(f"ib_mode={cfg.ib_mode!r} requires precomputed ib fields")

    # Single-phase density is constant (= cfg.rho_gas everywhere), so the MG
    # hierarchy is built here ONCE from constants — XLA constant-folds the
    # whole setup at compile time and the per-step cost is zero. (The CG
    # operator itself is still assembled from state.rho_u, so a user-modified
    # density only weakens the preconditioner, never correctness.)
    from fluidsolver_tpu.core import fields as _fields

    const_levels = build_step_levels(
        _fields.full_u(grid, cfg.rho_gas), _fields.full_v(grid, cfg.rho_gas),
        grid, cfg,
    )

    def subiter(state: FlowState, dp_prev, dt, levels=None, k=None):
        # ib may be a callable(state) for time-dependent solids
        # (the growing-solid case, examples/GrowingIB.cpp)
        ib_f = ib(state) if callable(ib) else ib

        U = stencil.mid_time(state.U, state.U_old)
        V = stencil.mid_time(state.V, state.V_old)

        dmomU, dmomV = mom.calc_dmomdt(
            U, V, state.rho_u_old, state.rho_v_old, state.visc, state.p,
            state.p_jump_u, state.p_jump_v, grid.dx, grid.dy, rho_eps,
        )
        if cfg.gravity != (0.0, 0.0):
            gx, gy = cfg.gravity
            from fluidsolver_tpu.core.fields import add_interior

            dmomU = add_interior(dmomU, gx * state.rho_u[1:-1, 1:-1])
            dmomV = add_interior(dmomV, gy * state.rho_v[1:-1, 1:-1])
        if cfg.ib_mode == "luchini":
            from fluidsolver_tpu.ib import luchini

            U, V = luchini.update_velocity_semi_analytical(
                dmomU, dmomV, dt, ib_f, state.U_old, state.V_old,
                state.rho_u_old, state.rho_v_old, state.rho_u, state.rho_v,
                state.visc, U, V,
            )
        else:
            U, V = mom.update_velocity(
                state.U_old, state.V_old, state.rho_u_old, state.rho_v_old,
                state.rho_u, state.rho_v, dmomU, dmomV, dt, U, V,
            )
            if cfg.ib_mode == "luchini_implicit":
                from fluidsolver_tpu.ib import luchini

                U, V = luchini.correct_velocity_implicit_euler(
                    U, V, ib_f, dt, state.visc, state.rho_u, state.rho_v
                )
        U, V = bc_mod.apply_velocity_bcs(U, V, grid, cfg.bcs, state.t)

        if cfg.outflow_correction:
            _, _, mass_err = mom.inflow_outflow(U, state.rho_u)
            U = mom.correct_outflow(U, state.rho_u, mass_err)

        if cfg.flow_forcing is not None:
            # drive the periodic channel to a fixed total mass flow
            # (test/PeriodicChannel.cpp:187-197)
            ncols = U.shape[1]
            inflow = jnp.sum(state.rho_u[0, :] * U[0, :] * grid.dy)
            outflow = jnp.sum(state.rho_u[-1, :] * U[-1, :] * grid.dy)
            from fluidsolver_tpu.core.fields import row_add

            U = row_add(
                U, 0, (cfg.flow_forcing - inflow) / (state.rho_u[0, :] * grid.dy * ncols)
            )
            U = row_add(
                U, -1, (cfg.flow_forcing - outflow) / (state.rho_u[-1, :] * grid.dy * ncols)
            )

        if cfg.ib_mode == "diffuse":
            from fluidsolver_tpu.ib import diffuse

            U, V, _, _ = diffuse.apply_direct_forcing(U, V, ib_f)
        elif cfg.ib_mode == "sharp":
            from fluidsolver_tpu.ib import sharp

            U, V = sharp.apply_forcing(U, V, ib_f)

        div = stencil.divergence(U, V, grid.dx, grid.dy)
        if div_source is not None:
            div = div + div_source(state, dt)
        if cfg.pressure_tol_intermediate is not None and k is not None:
            tol_eff = jnp.where(k == cfg.num_subiter - 1, cfg.pressure_tol,
                                cfg.pressure_tol_intermediate)
        else:
            tol_eff = None
        delta_p, rel, iters = pressure_solve(
            state, div, dt, grid, cfg,
            x0=dp_prev if cfg.pressure_warm_start else None,
            levels=levels, tol=tol_eff,
        )
        p = state.p + delta_p
        U, V = project_velocity(U, V, delta_p, state.rho_u, state.rho_v, dt, grid.dx, grid.dy)

        return dataclasses.replace(
            state, U=U, V=V, p=p, p_res=rel, p_iter=state.p_iter + iters
        ), delta_p

    @jax.jit
    def step(state: FlowState, t_end) -> FlowState:
        dt = mom.adjust_dt(
            state.U, state.V, state.rho_u, state.rho_v, state.visc,
            grid.dx, grid.dy, cfg.rho_gas, cfg.rho_liquid, cfg.sigma,
            cfg.cfl_max, cfg.dt_max,
        )
        dt = clamp_dt_to_end(dt, state.t, t_end)
        state = save_old(state)
        state = dataclasses.replace(state, p_iter=jnp.zeros((), jnp.int32))
        # fori_loop so the subiteration (incl. the pressure solve) compiles
        # once; dt == 0 (t_end reached, e.g. trailing scan steps) skips the
        # physics entirely — the Poisson RHS divides by dt. The carry also
        # threads the pressure increment so each subiteration warm-starts
        # from the previous one (cfg.pressure_warm_start).
        dp0 = jnp.zeros_like(state.p)

        def do_subiters(s):
            return jax.lax.fori_loop(
                0, cfg.num_subiter,
                lambda k, c: subiter(c[0], c[1], dt, const_levels, k),
                (s, dp0),
            )[0]

        state = jax.lax.cond(dt > 0.0, do_subiters, lambda s: s, state)
        return dataclasses.replace(state, t=state.t + dt, dt=dt)

    return step


def run(state: FlowState, t_end: float, grid: Grid, cfg: SolverConfig,
        callback=None, max_steps: int = 1_000_000) -> FlowState:
    """Host time loop: while t < t_end, mirroring the drivers' main loops."""
    step = make_step(grid, cfg)
    for _ in range(max_steps):
        if float(state.t) >= t_end - end_tolerance(state.t.dtype, t_end):
            break
        state = step(state, t_end)
        if callback is not None:
            callback(state)
    return state


def make_scan_runner(grid: Grid, cfg: SolverConfig, n_steps: int, ib=None, div_source=None):
    """Fixed-step production runner: ``n_steps`` steps in one lax.scan
    (single dispatch; steps past ``t_end`` clamp to dt=0 no-ops)."""
    inner = make_step(grid, cfg, ib=ib, div_source=div_source).__wrapped__

    @jax.jit
    def run_n(state: FlowState, t_end) -> FlowState:
        return jax.lax.scan(
            lambda c, _: (inner(c, t_end), None), state, None, length=n_steps
        )[0]

    return run_n
