"""Periodic body-forced channel and function-valued-Dirichlet channel.

Replicates test/PeriodicChannel.cpp:269-301 (flow forcing drives a parabolic
profile with the expected constant dp/dx) and
test/CustomDirichletChannel.cpp:260-298 (imposed analytic inflow; measured
average dp/dx matches the imposed DPDX).
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


@pytest.mark.slow
def test_periodic_channel():
    ny = 43 if FULL else 21
    nx = 5 * ny
    t_end = 60.0 if FULL else 30.0
    visc, rho, u_init = 1e-3, 0.5, 1.0
    total_flow = 1.0 * u_init * rho
    g = make_grid(0.0, 5.0, nx, 0.0, 1.0, ny)
    cfg = SolverConfig(
        rho_gas=rho, rho_liquid=rho, visc_gas=visc, visc_liquid=visc,
        cfl_max=0.9, dt_max=1e-1, num_subiter=2,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(bc.Periodic(), bc.Periodic(), bc.Dirichlet(), bc.Dirichlet()),
        flow_forcing=total_flow,
    )
    state = init_flow_state(g, rho, visc)
    state = dataclasses.replace(state, U=state.U.at[1:-1, 1:-1].set(u_init))
    U, V = bc.apply_velocity_bcs(state.U, state.V, g, cfg.bcs)
    state = dataclasses.replace(state, U=U, V=V)

    state = incomp.run(state, t_end, g, cfg)
    U = np.asarray(state.U)
    rho_u = np.asarray(state.rho_u)
    assert not np.any(np.isnan(U))

    # total flow maintained (test/PeriodicChannel.cpp:231-238)
    inflow = float(np.sum(rho_u[0, :] * U[0, :]) * g.dy)
    assert abs(inflow - total_flow) < 1e-8

    # the forced steady profile is the Poiseuille solution of the measured
    # dp/dx (reference TOLs 1e-4 / 1e-3)
    p = np.asarray(state.p)
    mid = (ny + 2) // 2
    dpdx = (p[nx // 2 + 2, mid] - p[nx // 2 + 1, mid]) / g.dx
    for i in [nx // 4, nx // 2, 3 * nx // 4]:
        dpdx_i = (p[i + 1, mid] - p[i, mid]) / g.dx
        assert abs(dpdx_i - dpdx) < 1e-4
        u_ana = dpdx / (2.0 * visc) * (g.ym**2 - g.ym)
        l1 = np.trapezoid(np.abs(U[i + 1, :] - u_ana), g.ym)
        # reference TOL 1e-3 at ny=43; discretization error scales ~ dy^2
        tol = 1e-3 if FULL else 1.5e-3 * (43.0 / ny) ** 2
        assert l1 < tol, f"x-index {i}: L1 = {l1:.3e} (tol {tol:.1e})"


@pytest.mark.slow
def test_custom_dirichlet_channel():
    ny = 43 if FULL else 21
    nx = 5 * ny
    t_end = 60.0 if FULL else 30.0
    visc, rho, u_avg = 1e-3, 0.5, 1.0
    total_flow = 1.0 * u_avg * rho
    dpdx_imposed = -12.0 * visc * total_flow / rho
    g = make_grid(0.0, 5.0, nx, 0.0, 1.0, ny)

    def inflow_profile(y, t):
        return dpdx_imposed / (2.0 * visc) * (y * y - y)

    cfg = SolverConfig(
        rho_gas=rho, rho_liquid=rho, visc_gas=visc, visc_liquid=visc,
        cfl_max=0.9, dt_max=1e-1, num_subiter=2,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=inflow_profile, v=0.0), bc.Neumann(),
            bc.Dirichlet(), bc.Dirichlet(),
        ),
        outflow_correction=True,
    )
    state = init_flow_state(g, rho, visc)
    U, V = bc.apply_velocity_bcs(state.U, state.V, g, cfg.bcs, t=0.0)
    state = dataclasses.replace(state, U=U, V=V)

    state = incomp.run(state, t_end, g, cfg)
    p = np.asarray(state.p)
    assert not np.any(np.isnan(p))

    # average dp/dx over the channel matches the imposed value
    # (test/CustomDirichletChannel.cpp:260-298, TOLs 1e-4 / 2e-3)
    mid = (ny + 2) // 2
    i0, i1 = nx // 4, 3 * nx // 4
    avg_dpdx = (p[i1, mid] - p[i0, mid]) / ((i1 - i0) * g.dx)
    assert abs(avg_dpdx - dpdx_imposed) < 2e-3, f"{avg_dpdx} vs {dpdx_imposed}"
