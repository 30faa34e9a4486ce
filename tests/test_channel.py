"""Laminar channel & Couette integration tests.

Replicates the steady-profile invariants of test/LaminarChannel.cpp:277-337
(column-constant pressure, constant dp/dx, parabolic Poiseuille profile) and
test/Couette.cpp:224-241 (linear profile to 1e-5, inflow == outflow).

Default-suite variants use shorter channels / lower Re so the suite stays
fast; FS_FULL_TESTS=1 switches to the reference's exact configurations.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import incomp
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.solvers.state import init_flow_state

FULL = os.environ.get("FS_FULL_TESTS") == "1"


def _trapz(f, x):
    return np.trapezoid(f, x)


@pytest.mark.slow
@pytest.mark.parametrize("u_init", [0.0, 1.0])
def test_laminar_channel(u_init):
    if FULL:
        nx, ny, x_max, t_end, visc = 750, 15, 100.0, 60.0, 1e-3
        check_from, check_step = 60.0, 10.0
    else:
        nx, ny, x_max, t_end, visc = 225, 15, 30.0, 30.0, 5e-3
        check_from, check_step = 18.0, 5.0
    rho, u_in = 0.5, 1.0
    g = make_grid(0.0, x_max, nx, 0.0, 1.0, ny)
    cfg = SolverConfig(
        rho_gas=rho, rho_liquid=rho, visc_gas=visc, visc_liquid=visc,
        cfl_max=0.9, dt_max=1e-1, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=u_in, v=0.0), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
    )
    state = init_flow_state(g, rho, visc)
    state = dataclasses.replace(state, U=state.U.at[1:-1, 1:-1].set(u_init))
    U, V = bc.apply_velocity_bcs(state.U, state.V, g, cfg.bcs)
    state = dataclasses.replace(state, U=U, V=V)

    state = incomp.run(state, t_end, g, cfg)

    U = np.asarray(state.U)
    p = np.asarray(state.p)
    assert not np.any(np.isnan(U))

    # mass conservation across the channel (test/LaminarChannel.cpp:238-247)
    rho_u = np.asarray(state.rho_u)
    inflow = np.sum(rho_u[0, :] * U[0, :])
    outflow = np.sum(rho_u[-1, :] * U[-1, :])
    assert abs(outflow - inflow) < 1e-8

    i_from = int(np.searchsorted(g.xm, check_from))
    # pressure constant along y in the developed region (TOL 1e-4)
    dev = p[i_from:-1, 1:-1]
    assert np.max(np.abs(dev - dev[:, :1])) < 1e-4

    # dp/dx constant in the developed region (TOL 1e-4)
    mid = (ny + 2) // 2
    dpdx = (p[i_from:, mid] - p[i_from - 1:-1, mid]) / g.dx
    assert np.max(np.abs(dpdx - dpdx[0])) < 1e-4

    # parabolic profile with the locally measured dp/dx (TOL 7.5e-3)
    n_checks = int((x_max - check_from) / check_step)
    for k in range(n_checks):
        x_t = check_from + k * check_step
        i = int(x_t / x_max * (nx + 1))
        dpdx_loc = (p[i, :] - p[i - 1, :]) / g.dx
        u_ana = dpdx_loc / (2.0 * visc) * (g.ym**2 - g.ym)
        diff = np.abs(U[i, :] - u_ana)
        l1 = _trapz(diff, g.ym)
        assert l1 < 7.5e-3, f"profile at x={x_t}: L1={l1:.3e}"


@pytest.mark.slow
def test_couette():
    if FULL:
        nx, ny = 210, 21
    else:
        nx, ny = 64, 11
    rho, visc, u_top, t_end = 0.9, 0.1, 1.0, 10.0
    g = make_grid(0.0, 10.0, nx, 0.0, 1.0, ny)
    cfg = SolverConfig(
        rho_gas=rho, rho_liquid=rho, visc_gas=visc, visc_liquid=visc,
        cfl_max=0.9, dt_max=1e-1, num_subiter=2,
        pressure_tol=1e-6, pressure_max_iter=500,
        bcs=bc.FlowBCs(
            bc.Neumann(), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=u_top, v=0.0),
        ),
    )
    state = init_flow_state(g, rho, visc)
    U, V = bc.apply_velocity_bcs(state.U, state.V, g, cfg.bcs)
    state = dataclasses.replace(state, U=U, V=V)

    mass_errors = []

    def track(s):
        U = s.U
        inflow = float(jnp.sum(s.rho_u[1, :] * U[1, :]))
        outflow = float(jnp.sum(s.rho_u[-2, :] * U[-2, :]))
        mass_errors.append(abs(outflow - inflow))

    state = incomp.run(state, t_end, g, cfg, callback=track)

    assert max(mass_errors) < 1e-8, f"max mass error {max(mass_errors):.3e}"

    U = np.asarray(state.U)
    for i in [nx // 4, nx // 2, 3 * nx // 4]:
        diff = np.abs(U[i + 1, :] - u_top * g.ym)
        l1 = _trapz(diff, g.ym)
        assert l1 < 1e-5, f"Couette profile at i={i}: L1={l1:.3e}"
