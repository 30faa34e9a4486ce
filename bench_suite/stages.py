"""Per-stage timing of the two-phase step at production size/precision.

Times each pipeline stage of the canonical two-phase step (solvers/
twophase.py) in isolation with fori-amortized dispatch (the tunneled TPU's
per-dispatch latency dwarfs single kernels). Prints CSV `stage,ms`.

Usage: python bench_suite/stages.py [n] (default 1024)
"""

from __future__ import annotations

import sys

import numpy as np

from common import time_kernel


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    from fluidsolver_tpu.core import bc as bc_mod
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import momentum as mom
    from fluidsolver_tpu.ops import stencil
    from fluidsolver_tpu.poisson import cg, linsys
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.solvers.config import SolverConfig
    from fluidsolver_tpu.vof import advect as adv
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.curvature import curvature_quad_volume_matching
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=100,
        bcs=bc_mod.FlowBCs(
            bc_mod.Dirichlet(u=0.5, v=0.0), bc_mod.Neumann(),
            bc_mod.Dirichlet(u=0.0, v=0.0), bc_mod.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1 ** 2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    step = twophase.make_step(g, cfg)
    # develop the flow so every stage sees representative data
    for k in range(10):
        state = step(state, 1e9)
        if k % 2 == 1:
            # real drain: block_until_ready does not pace the tunnel (it
            # acks dispatch, not completion) and an unpaced multi-step
            # queue crashes the axon worker with UNAVAILABLE
            float(state.flow.dt)

    fs = state.flow
    vf = state.vf
    dt = jnp.maximum(fs.dt, 1e-4)
    rho_eps = mom.calc_rho_eps(cfg.rho_gas, cfg.rho_liquid)
    rec = plic.elvira(vf, g.dx, g.dy)
    Ui = stencil.interp_u_center(fs.U)
    Vi = stencil.interp_v_center(fs.V)
    iface_len = plic.interface_length(rec, g.dx, g.dy)
    curv = curvature_quad_volume_matching(vf, rec, g)
    div = stencil.divergence(fs.U, fs.V, g.dx, g.dy)
    op = linsys.assemble_pressure_operator(fs.rho_u, fs.rho_v, g.dx, g.dy, None)
    rhs = linsys.build_pressure_rhs(div, g.dx, g.dy, dt, None)

    print("stage,ms")

    def report(name, kernel, carry):
        ms, _ = time_kernel(kernel, carry, inner=20, reps=3)
        print(f"{name},{ms * 1e3:.3f}", flush=True)

    def report_dispatched(name, kernel, carry, k=8):
        """fori-free variant (vof.advect faults Mosaic inside fori_loop,
        CLAUDE.md): difference K vs 2K dispatch chains so the fixed
        per-dispatch latency cancels. Drain via device->host read — see
        common._drain."""
        import time as _t

        from common import _drain

        jitted = jax.jit(kernel)
        _drain(jitted(carry))

        def run(m):
            c = carry
            t0 = _t.perf_counter()
            for _ in range(m):
                c = jitted(c)
            _drain(c)
            return _t.perf_counter() - t0

        samples = []
        for _ in range(3):
            t1 = run(k)
            t2 = run(2 * k)
            samples.append((t2 - t1) / k * 1e3)
        pos = sorted(s for s in samples if s > 0)
        ms = pos[len(pos) // 2] if pos else max(samples)
        print(f"{name},{ms:.3f}", flush=True)

    # calibration: known-bandwidth elementwise op (reads+writes 2 arrays).
    # If this is far above (2 * bytes / 819GB/s), the device/tunnel is
    # degraded and every number below is inflated — discard the run.
    report("calibration_axpy", lambda c: c * 1.000001 + 0.5, fs.p)

    # momentum stage: drhodt + dmomdt + velocity update (one subiter's worth)
    def k_mom(c):
        U, V = c
        drho_u, drho_v = mom.calc_drhodt(U, V, fs.rho_u_old, fs.rho_v_old, g.dx, g.dy, rho_eps)
        rho_u, rho_v = mom.update_density(fs.rho_u_old, fs.rho_v_old, drho_u, drho_v, dt, fs.rho_u, fs.rho_v)
        dmomU, dmomV = mom.calc_dmomdt(
            U, V, fs.rho_u_old, fs.rho_v_old, fs.visc, fs.p,
            fs.p_jump_u, fs.p_jump_v, g.dx, g.dy, rho_eps,
        )
        U2, V2 = mom.update_velocity(
            fs.U_old, fs.V_old, fs.rho_u_old, fs.rho_v_old, rho_u, rho_v,
            dmomU, dmomV, dt, U, V,
        )
        return (U2, V2)

    report("momentum_subiter", k_mom, (fs.U, fs.V))

    # poisson: one full PCG solve (boxmg default), developed coefficients
    def k_poisson(c):
        x, _, _ = cg.solve_pcg(
            op, c, tol=cfg.pressure_tol, max_iter=cfg.pressure_max_iter,
            singular=True, precond=cfg.pressure_solver,
            n_pre=cfg.mg_pre, n_post=cfg.mg_post,
        )
        return c + 1e-30 * x  # 1e-30 (not 0.0): XLA folds 0*x and DCEs the stage

    report("poisson_solve", k_poisson, rhs)

    # poisson setup only (hierarchy build)
    from fluidsolver_tpu.poisson import boxmg

    def k_setup(c):
        lv = boxmg.build_hierarchy(
            linsys.assemble_pressure_operator(c, fs.rho_v, g.dx, g.dy, None)
        )
        return c + 1e-30 * sum(jnp.sum(l.op.aC) for l in lv)

    report("boxmg_setup", k_setup, fs.rho_u)

    # one V(2,2) cycle
    levels = boxmg.build_hierarchy(op)

    def k_vcycle(c):
        return c + 1e-30 * boxmg.v_cycle(levels, c, 2, 2)

    report("boxmg_vcycle22", k_vcycle, rhs)

    # vof: elvira reconstruction
    def k_elvira(c):
        r = plic.elvira(c, g.dx, g.dy)
        return c + 1e-30 * r.d

    report("elvira", k_elvira, vf)

    # vof: geometric advection (NOT inside fori_loop — faults Mosaic)
    def k_advect(c):
        out, _ = adv.advect(c, rec, fs.U, fs.V, Ui, Vi, g, dt)
        return out

    report_dispatched("vof_advect", k_advect, vf)

    # curvature (volume matching)
    def k_curv(c):
        return c + 1e-30 * curvature_quad_volume_matching(vf, rec, g)

    report("curvature_vm", k_curv, curv)

    # pressure jump + divergence + bc application (cheap glue)
    def k_glue(c):
        U, V = bc_mod.apply_velocity_bcs(fs.U, fs.V, g, cfg.bcs, fs.t)
        d = stencil.divergence(U, V, g.dx, g.dy)
        pj_u, pj_v = mom.calc_pressure_jump(
            vf, curv, iface_len, cfg.sigma, g.dx, g.dy, fs.p_jump_u, fs.p_jump_v
        )
        return c + 1e-30 * (d + pj_u[:-1, :] + pj_v[:, :-1])

    report("bc_div_pjump", k_glue, div)


if __name__ == "__main__":
    main()
