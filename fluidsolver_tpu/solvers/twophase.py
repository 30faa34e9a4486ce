"""Two-phase VOF Navier-Stokes solver.

The canonical coupled time step (reference: examples/TwoPhaseSolver.cpp:
264-401, and with gravity examples/RisingBubble.cpp:417-470):

  dt (CFL incl. capillary + gravity limits) -> state rotation ->
  ELVIRA reconstruction of vf_old -> rho from vf_old -> geometric VOF
  advection -> viscosity from new vf -> subiterations of {
    Crank-Nicolson midpoint; consistent density transport; momentum with
    hybrid upwinding; BCs + outflow fix; divergence; curvature + pressure-
    jump increment folded into the Poisson RHS; variable-coefficient MG-PCG
    solve (operator rebuilt every subiteration — assembly is elementwise,
    unlike the reference's costly HYPRE PFMG re-setup); projection }.

One jitted pure function per step; host loop reads back only ``t``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fluidsolver_tpu.core import bc as bc_mod
from fluidsolver_tpu.core.fields import (add_interior,
                                           register_pytree_dataclass)
from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.ops import momentum as mom
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.solvers import incomp
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.solvers.state import (FlowState, clamp_dt_to_end,
                                            end_tolerance, init_flow_state)
from fluidsolver_tpu.vof import advect as adv
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.curvature import curvature_quad_volume_matching

import os


def _use_pallas_momentum() -> bool:
    """Fused Pallas momentum stage: default-on for TPU single-chip
    (validated on hardware; see fluidsolver_tpu.flags), FS_PALLAS_MOMENTUM
    env overrides in either direction."""
    from fluidsolver_tpu.flags import pallas_enabled

    return pallas_enabled("FS_PALLAS_MOMENTUM")


@register_pytree_dataclass
@dataclasses.dataclass
class TwoPhaseState:
    flow: FlowState
    vf: jnp.ndarray
    vf_old: jnp.ndarray
    curv: jnp.ndarray
    interface_length: jnp.ndarray
    vof_vol_error: jnp.ndarray


def init_two_phase_state(grid: Grid, cfg: SolverConfig, vf0, dtype=None) -> TwoPhaseState:
    """vf0: cell fractions over the full ghost box (e.g. from
    vof.init.liquid_fraction_from_indicator)."""
    flow = init_flow_state(grid, cfg.rho_gas, cfg.visc_gas, dtype)
    vf = jnp.asarray(vf0, dtype=flow.p.dtype)
    rho_u, rho_v = mom.mix_rho_staggered(vf, cfg.rho_gas, cfg.rho_liquid, flow.rho_u, flow.rho_v)
    visc = mom.mix_visc(vf, cfg.visc_gas, cfg.visc_liquid, cfg.arithmetic_visc)
    flow = dataclasses.replace(
        flow, rho_u=rho_u, rho_v=rho_v, rho_u_old=rho_u, rho_v_old=rho_v, visc=visc
    )
    return TwoPhaseState(
        flow=flow,
        vf=vf,
        vf_old=vf,
        curv=jnp.zeros_like(vf),
        interface_length=jnp.zeros_like(vf),
        vof_vol_error=jnp.zeros((), vf.dtype),
    )


def make_step(grid: Grid, cfg: SolverConfig, mesh=None):
    """Build the jitted two-phase step. ``mesh``: a 1D x-slab
    ``jax.sharding.Mesh`` — the PRODUCTION multi-chip step: every field is
    sharded along grid-x (GSPMD domain decomposition for the stencil/VOF
    stages, whose halo collectives XLA inserts) and the pressure Poisson
    solve runs the explicit shard_map distributed BoxMG-PCG
    (parallel/dist_poisson.py) with ICI point-to-point halo exchange.
    ``pressure_precond_refresh="step"`` works on a mesh too: the
    distributed hierarchy pair (dist_poisson.build_hierarchy_sharded) is
    built once inside subiteration 0 and carried across the remaining
    subiteration solves, instead of rebuilt inside every solve."""
    rho_eps = mom.calc_rho_eps(cfg.rho_gas, cfg.rho_liquid)
    gx, gy = cfg.gravity

    # Sparse VOF's global lane indices force GSPMD to all-gather full
    # fields on every device (measured: tools/collective_census.py flagged
    # 20 full-field all-gathers, all from the lane gather/scatter). Under a
    # mesh the sparse ADVECTION (the 5.5x dense-vs-sparse stage, PERF.md)
    # therefore runs as an explicit shard_map with per-shard lane
    # compaction (parallel/dist_vof.py); elvira/curvature stay dense there
    # (pure stencil math, partitions elementwise). Single-device keeps the
    # sparse path everywhere.
    vof_budget = 0 if mesh is not None else cfg.vof_max_active
    vof_sharded = False
    if mesh is not None and cfg.vof_max_active != 0 \
            and not cfg.vof_staggered_backtrace:
        from fluidsolver_tpu.parallel import dist_vof

        vof_sharded = dist_vof.available(grid, mesh.shape["x"])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        def _constrain(x):
            if hasattr(x, "ndim") and x.ndim >= 2:
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _P(*(("x",) + (None,) * (x.ndim - 1))))
                )
            return x

        def constrain_tree(t):
            return jax.tree_util.tree_map(_constrain, t)
    else:
        def constrain_tree(t):
            return t

    def subiter(fs: FlowState, dp_prev, vof_state, dt, t, k=None, levels_carry=None,
                mom_pre=None):
        vf_old, rec, curv, iface_len, m_dot_A = vof_state

        U = stencil.mid_time(fs.U, fs.U_old)
        V = stencil.mid_time(fs.V, fs.V_old)

        if _use_pallas_momentum():
            # one banded Pallas pass for the whole momentum stage
            # (ops/pallas_momentum.py — identical math, single HBM read of
            # the shared fields); gravity interior add is equivalent before
            # or after the Neumann ghost fill. mom_pre carries the per-step-
            # constant inputs pre-padded once per step.
            from fluidsolver_tpu.ops.pallas_momentum import fused_momentum

            rho_u, rho_v, U, V = fused_momentum(
                U, V, fs.U_old, fs.V_old, fs.rho_u_old, fs.rho_v_old,
                fs.rho_u, fs.rho_v, fs.visc, fs.p, fs.p_jump_u, fs.p_jump_v,
                dt, dx=grid.dx, dy=grid.dy, rho_eps=rho_eps, gx=gx, gy=gy,
                prepadded=mom_pre,
            )
            rho_u = bc_mod.apply_neumann_scalar(rho_u)
            rho_v = bc_mod.apply_neumann_scalar(rho_v)
        else:
            # consistent density transport (TwoPhaseSolver.cpp:287-295)
            drho_u, drho_v = mom.calc_drhodt(U, V, fs.rho_u_old, fs.rho_v_old, grid.dx, grid.dy, rho_eps)
            rho_u, rho_v = mom.update_density(fs.rho_u_old, fs.rho_v_old, drho_u, drho_v, dt, fs.rho_u, fs.rho_v)
            rho_u = bc_mod.apply_neumann_scalar(rho_u)
            rho_v = bc_mod.apply_neumann_scalar(rho_v)

            # momentum (TwoPhaseSolver.cpp:298-306) + gravity (RisingBubble.cpp:453-455)
            dmomU, dmomV = mom.calc_dmomdt(
                U, V, fs.rho_u_old, fs.rho_v_old, fs.visc, fs.p,
                fs.p_jump_u, fs.p_jump_v, grid.dx, grid.dy, rho_eps,
            )
            # add_interior (pad+add), not .at[].add: interior scatters make
            # GSPMD all-gather the full field (core/fields.add_interior)
            if gx != 0.0:
                dmomU = add_interior(dmomU, rho_u[1:-1, 1:-1] * gx)
            if gy != 0.0:
                dmomV = add_interior(dmomV, rho_v[1:-1, 1:-1] * gy)
            U, V = mom.update_velocity(
                fs.U_old, fs.V_old, fs.rho_u_old, fs.rho_v_old, rho_u, rho_v, dmomU, dmomV, dt, U, V
            )
        U, V = bc_mod.apply_velocity_bcs(U, V, grid, cfg.bcs, t)

        if cfg.outflow_correction:
            _, _, mass_err = mom.inflow_outflow(U, rho_u)
            U = mom.correct_outflow(U, rho_u, mass_err)

        div = stencil.divergence(U, V, grid.dx, grid.dy)

        if cfg.surface_tension_method == "tangent_force":
            # explicit tangential interface pull injected straight into the
            # Poisson RHS (the reference's alternative capillary branch,
            # TwoPhaseSolver.cpp:348-355, incl. its hard-coded 100x
            # calibration as cfg.tangent_force_scale). p_jump stays zero:
            # in this mode the momentum equation carries no capillary term —
            # the pressure field alone balances the interface.
            fsu, fsv = mom.calc_surface_tension_force(
                rec.nx, rec.ny, rec.valid, cfg.sigma, fs.p_jump_u, fs.p_jump_v
            )
            pj_u_new, pj_v_new = fs.p_jump_u, fs.p_jump_v
            div = add_interior(div, -dt * cfg.tangent_force_scale * (
                (fsu[2:-1, 1:-1] - fsu[1:-2, 1:-1]) / grid.dx
                + (fsv[1:-1, 2:-1] - fsv[1:-1, 1:-2]) / grid.dy
            ))
        else:
            # capillary forcing: pressure-jump increment folded into the RHS
            # (TwoPhaseSolver.cpp:322-346)
            pj_u_new, pj_v_new = mom.calc_pressure_jump(
                vf_old, curv, iface_len, cfg.sigma, grid.dx, grid.dy, fs.p_jump_u, fs.p_jump_v
            )
            dpj_u = pj_u_new - fs.p_jump_u
            dpj_v = pj_v_new - fs.p_jump_v
            div = add_interior(div, dt * (
                (dpj_u[2:-1, 1:-1] / rho_u[2:-1, 1:-1] - dpj_u[1:-2, 1:-1] / rho_u[1:-2, 1:-1]) / grid.dx
                + (dpj_v[1:-1, 2:-1] / rho_v[1:-1, 2:-1] - dpj_v[1:-1, 1:-2] / rho_v[1:-1, 1:-2]) / grid.dy
            ))

        if cfg.phase_change_mdot is not None:
            # expansion source on pure-liquid cells near the interface:
            # each mixed cell's m_dot*A is distributed over the surrounding
            # pure-liquid cells (examples/ExpandingBubble.cpp:302-321)
            from fluidsolver_tpu.constants import vf_cutoffs

            pure = (vf_old >= vf_cutoffs(vf_old.dtype)[1]).astype(div.dtype)
            ker = jnp.ones((3, 3), div.dtype)

            def box3(f):
                from jax import lax

                return lax.conv_general_dilated(
                    f[None, None], ker[None, None], (1, 1), "SAME"
                )[0, 0]

            avg = box3(pure)[1:-1, 1:-1] / 9.0
            msum = box3(m_dot_A)[1:-1, 1:-1]
            avg_safe = jnp.where(avg > 0.0, avg, 1.0)
            src = jnp.where(
                pure[1:-1, 1:-1] > 0.0,
                msum / avg_safe * (1.0 / cfg.rho_gas - 1.0 / cfg.rho_liquid)
                / (grid.dx * grid.dy),
                0.0,
            )
            div = add_interior(div, -src)

        fs = dataclasses.replace(fs, rho_u=rho_u, rho_v=rho_v, p_jump_u=pj_u_new, p_jump_v=pj_v_new)
        if levels_carry is not None:
            # per-step refresh: build from THIS subiteration's transported
            # densities on the first pass, reuse the hierarchy afterwards
            levels = jax.lax.cond(
                k == 0,
                lambda: (
                    incomp.build_step_levels(rho_u, rho_v, grid, cfg)
                    if mesh is None else
                    incomp.build_step_levels_sharded(
                        rho_u, rho_v, grid, cfg, mesh)
                ),
                lambda: levels_carry,
            )
        else:
            levels = None
        if cfg.pressure_tol_intermediate is not None and k is not None:
            # loose intermediate solves, tight final (see config.py); k may
            # be traced (fori_loop), so select at runtime
            tol_eff = jnp.where(k == cfg.num_subiter - 1,
                                cfg.pressure_tol,
                                cfg.pressure_tol_intermediate)
        else:
            tol_eff = None
        delta_p, rel, iters = incomp.pressure_solve(
            fs, div, dt, grid, cfg,
            x0=dp_prev if cfg.pressure_warm_start else None,
            levels=levels, tol=tol_eff, mesh=mesh,
        )
        p = fs.p + delta_p
        U, V = incomp.project_velocity(U, V, delta_p, rho_u, rho_v, dt, grid.dx, grid.dy)

        fs_out = dataclasses.replace(
            fs, U=U, V=V, p=p, p_res=rel, p_iter=fs.p_iter + iters
        )
        if levels_carry is not None:
            return fs_out, delta_p, levels
        return fs_out, delta_p

    @jax.jit
    def step(state: TwoPhaseState, t_end) -> TwoPhaseState:
        state = constrain_tree(state)
        fs = state.flow
        dt = mom.adjust_dt(
            fs.U, fs.V, fs.rho_u, fs.rho_v, fs.visc, grid.dx, grid.dy,
            cfg.rho_gas, cfg.rho_liquid, cfg.sigma, cfg.cfl_max, cfg.dt_max,
        )
        if gy != 0.0:
            dt = jnp.minimum(dt, cfg.cfl_max * jnp.sqrt(grid.dy / abs(gy)))
        if gx != 0.0:
            dt = jnp.minimum(dt, cfg.cfl_max * jnp.sqrt(grid.dx / abs(gx)))
        dt = clamp_dt_to_end(dt, fs.t, t_end)

        # state rotation: velocity now, density after remixing from vf_old
        fs = dataclasses.replace(fs, U_old=fs.U, V_old=fs.V)
        vf_old = state.vf

        # reconstruct vf_old; rho from vf_old; rotate density
        rec = plic.elvira(vf_old, grid.dx, grid.dy, max_mixed=vof_budget)
        rho_u, rho_v = mom.mix_rho_staggered(vf_old, cfg.rho_gas, cfg.rho_liquid, fs.rho_u, fs.rho_v)
        fs = dataclasses.replace(fs, rho_u=rho_u, rho_v=rho_v, rho_u_old=rho_u, rho_v_old=rho_v)

        if cfg.phase_change_mdot is not None:
            # Interfacial mass flux (examples/ExpandingBubble.cpp:222-241):
            # per-cell m_dot*A for the expansion source, and a Stefan
            # displacement of the PLIC planes into the liquid. The divergence
            # source lives in the PURE-liquid ring outside the interface, so
            # the interface cells sit in its stagnation zone and all growth
            # must come through this shift: s = m_dot*(1/rho_g - 1/rho_l)*dt
            # (the reference's m_dot*dt/(rho_l*dx) appears to be an
            # IRL-normalized-distance artifact; this form reproduces the
            # physical dV/dt = A*m_dot*(1/rho_g - 1/rho_l)).
            iface_len_pc = plic.interface_length(rec, grid.dx, grid.dy)
            m_dot_A = jnp.where(rec.valid, iface_len_pc * cfg.phase_change_mdot, 0.0)
            stefan = cfg.phase_change_mdot * dt * (1.0 / cfg.rho_gas - 1.0 / cfg.rho_liquid)
            rec = dataclasses.replace(
                rec, d=jnp.where(rec.valid, rec.d - stefan, rec.d)
            )
        else:
            m_dot_A = jnp.zeros_like(vf_old)

        # geometric VOF advection with the current velocity
        Ui = stencil.interp_u_center(fs.U)
        Vi = stencil.interp_v_center(fs.V)
        if vof_sharded:
            from fluidsolver_tpu.parallel import dist_vof

            vf, vol_err = dist_vof.advect_sharded(
                mesh, vf_old, rec, fs.U, fs.V, Ui, Vi, grid, dt,
                m_total=(cfg.vof_max_active
                         or adv.default_max_active(grid.nx, grid.ny)),
                no_correction=cfg.vof_no_correction,
            )
        else:
            vf, vol_err = adv.advect(
                vf_old, rec, fs.U, fs.V, Ui, Vi, grid, dt,
                max_active=vof_budget,
                pin=_constrain if mesh is not None else None,
                no_correction=cfg.vof_no_correction,
                staggered=cfg.vof_staggered_backtrace,
            )
        # a reconstruction lane overflow also invalidates the advection
        vol_err = jnp.where(rec.overflow, jnp.inf, vol_err)

        # viscosity from the NEW vf (TwoPhaseSolver.cpp:279)
        visc = mom.mix_visc(vf, cfg.visc_gas, cfg.visc_liquid, cfg.arithmetic_visc)
        fs = dataclasses.replace(fs, visc=visc, p_iter=jnp.zeros((), jnp.int32))

        # curvature + interface length from the vf_old reconstruction
        # (recomputed every subiteration in the reference via the unchanged
        # reconstruction — values are identical, so compute once here)
        if cfg.curvature_method == "regression":
            from fluidsolver_tpu.vof.curvature import curvature_quad_regression

            curv = curvature_quad_regression(vf_old, rec, grid)
        elif cfg.curvature_method == "convolved":
            from fluidsolver_tpu.vof.curvature import curvature_convolved_vf

            curv = curvature_convolved_vf(vf_old, rec, grid)
        else:
            curv = curvature_quad_volume_matching(
                vf_old, rec, grid, max_mixed=vof_budget
            )
        iface_len = plic.interface_length(rec, grid.dx, grid.dy)

        # fori_loop (not Python unroll): the subiteration body — including the
        # MG-PCG pressure solve — is traced and compiled ONCE, which keeps
        # XLA compile times sane for deep graphs. dt == 0 (t_end reached,
        # e.g. trailing scan steps) skips the physics (Poisson RHS has 1/dt).
        dp0 = jnp.zeros_like(fs.p)

        def do_subiters(f):
            # Hierarchy freshness matters at 1000:1 jumps: a preconditioner
            # built from step-START rho (or even the end-of-step PLIC-mixed
            # rho) measured 1.8-2.6x MORE PCG iterations than per-solve
            # rebuilds — alignment with the flux-transported rho of the
            # current subiteration dominates. Two supported policies:
            #   "solve": rebuild inside every solve (exact alignment);
            #   "step":  build once inside subiteration 0 from its exact
            #            transported rho, reuse for the rest (5x less setup).
            vof_state = (vf_old, rec, curv, iface_len, m_dot_A)
            if _use_pallas_momentum():
                # per-step-constant momentum inputs padded ONCE, outside
                # the subiteration loop (guaranteed hoist, ~25 kernels +
                # ~100 MB of HBM copies saved per step at 1024^2)
                from fluidsolver_tpu.ops import pallas_momentum as _pm

                mom_pre = _pm.prepad_step_constants(
                    f.U_old, f.V_old, f.rho_u_old, f.rho_v_old, f.visc,
                    f.p.shape,
                )
            else:
                mom_pre = None
            if cfg.pressure_precond_refresh == "step":
                shapes = jax.eval_shape(
                    lambda ru, rv: (
                        incomp.build_step_levels(ru, rv, grid, cfg)
                        if mesh is None else
                        incomp.build_step_levels_sharded(
                            ru, rv, grid, cfg, mesh)
                    ),
                    f.rho_u, f.rho_v,
                )
                zeros = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )
                return jax.lax.fori_loop(
                    0, cfg.num_subiter,
                    lambda k, c: subiter(
                        c[0], c[1], vof_state, dt, c[0].t, k, c[2],
                        mom_pre=mom_pre,
                    ),
                    (f, dp0, zeros),
                )[0]
            return jax.lax.fori_loop(
                0, cfg.num_subiter,
                lambda k, c: subiter(c[0], c[1], vof_state, dt, c[0].t, k,
                                     mom_pre=mom_pre),
                (f, dp0),
            )[0]

        # constrain BOTH branch outputs: if the branches disagree on
        # shardings, GSPMD reconciles the cond's outputs by replicating
        # them (measured: 5 full-field all-gathers at this merge,
        # tools/collective_census.py)
        fs = jax.lax.cond(dt > 0.0,
                          lambda f: constrain_tree(do_subiters(f)),
                          constrain_tree, fs)

        fs = dataclasses.replace(fs, t=fs.t + dt, dt=dt)
        return constrain_tree(TwoPhaseState(
            flow=fs, vf=vf, vf_old=vf_old, curv=curv,
            interface_length=iface_len, vof_vol_error=vol_err,
        ))

    return step


def make_kinematic_step(grid: Grid, cfg: SolverConfig, velocity):
    """VOF-only kinematic step: the velocity is PRESCRIBED analytically each
    step and only the interface is evolved (reconstruct -> advect), skipping
    momentum and pressure entirely — the reference's examples/VOF.cpp:80-120
    and the kinematic tests (test/{ConstantVelocityVOF,LinearVelocityVOF,
    TaylorGreenVortexVOF}.cpp) share this loop shape.

    ``velocity(t) -> (U, V)``: full ghost-inclusive staggered fields at time
    ``t`` (closing over the 1D grid coordinate vectors is fine — only O(n)
    data, re-uploaded cheaply per dispatch)."""

    @jax.jit
    def step(state: TwoPhaseState, t_end) -> TwoPhaseState:
        fs = state.flow
        U, V = velocity(fs.t)
        U = U.astype(fs.U.dtype)
        V = V.astype(fs.V.dtype)
        dt = mom.adjust_dt(
            U, V, fs.rho_u, fs.rho_v, fs.visc, grid.dx, grid.dy,
            cfg.rho_gas, cfg.rho_liquid, cfg.sigma, cfg.cfl_max, cfg.dt_max,
        )
        dt = clamp_dt_to_end(dt, fs.t, t_end)

        vf_old = state.vf
        rec = plic.elvira(vf_old, grid.dx, grid.dy, max_mixed=cfg.vof_max_active)
        Ui = stencil.interp_u_center(U)
        Vi = stencil.interp_v_center(V)
        vf, vol_err = adv.advect(
            vf_old, rec, U, V, Ui, Vi, grid, dt, max_active=cfg.vof_max_active
        )
        vol_err = jnp.where(rec.overflow, jnp.inf, vol_err)
        iface_len = plic.interface_length(rec, grid.dx, grid.dy)

        fs = dataclasses.replace(
            fs, U=U, V=V, U_old=fs.U, V_old=fs.V, t=fs.t + dt, dt=dt
        )
        return dataclasses.replace(
            state, flow=fs, vf=vf, vf_old=vf_old,
            interface_length=iface_len, vof_vol_error=vol_err,
        )

    return step


def run(state: TwoPhaseState, t_end: float, grid: Grid, cfg: SolverConfig,
        callback=None, max_steps: int = 1_000_000) -> TwoPhaseState:
    step = make_step(grid, cfg)
    for _ in range(max_steps):
        if float(state.flow.t) >= t_end - end_tolerance(state.flow.t.dtype, t_end):
            break
        state = step(state, t_end)
        if callback is not None:
            callback(state)
    return state


def make_scan_runner(grid: Grid, cfg: SolverConfig, n_steps: int, mesh=None):
    """Fixed-step production runner: ``n_steps`` full steps inside one
    ``lax.scan`` — a single device dispatch with no host round trips (steps
    past ``t_end`` become dt=0 no-ops via the clamp). ``mesh``: see
    make_step — the multi-chip production runner."""
    inner = make_step(grid, cfg, mesh=mesh).__wrapped__

    @jax.jit
    def run_n(state: TwoPhaseState, t_end) -> TwoPhaseState:
        return jax.lax.scan(
            lambda c, _: (inner(c, t_end), None), state, None, length=n_steps
        )[0]

    return run_n
