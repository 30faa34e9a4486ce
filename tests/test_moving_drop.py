"""Moving drop with an extreme (1e9) density ratio
(test/MovingDrop.cpp:18-380): the whole field moves at U=1 carrying the
drop; per step rho_stag stays positive, no NaNs in curvature/pressure, and
the drop's center of mass tracks the advection speed."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.utils.diagnostics import center_of_mass
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

FULL = os.environ.get("FS_FULL_TESTS") == "1"


@pytest.mark.slow
def test_moving_drop():
    n = 256 if FULL else 64
    t_end = 0.5 if FULL else 0.1
    u_drop = 1.0
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e9, visc_gas=1e-3, visc_liquid=1e-1,
        sigma=1.0 / 20.0, cfl_max=0.5, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(bc.Neumann(), bc.Neumann(), bc.Neumann(), bc.Neumann()),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.25) ** 2 + (y - 0.5) ** 2 <= 0.05**2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0)
    flow = state.flow
    U = flow.U.at[:, :].set(u_drop)
    U, V = bc.apply_velocity_bcs(U, flow.V, g, cfg.bcs)
    state = dataclasses.replace(state, flow=dataclasses.replace(flow, U=U, V=V))

    cx0, cy0 = (float(v) for v in center_of_mass(state.vf, g))

    failures = []

    def check(s):
        t = float(s.flow.t)
        if float(jnp.min(s.flow.rho_u)) <= 0.0 or float(jnp.min(s.flow.rho_v)) <= 0.0:
            failures.append(f"t={t}: non-positive rho_stag")
        for name, arr in [("curv", s.curv), ("p", s.flow.p), ("U", s.flow.U)]:
            if bool(jnp.any(jnp.isnan(arr))):
                failures.append(f"t={t}: NaN in {name}")
        if float(jnp.max(jnp.abs(s.flow.U))) > 10.0 * u_drop:
            failures.append(f"t={t}: runaway U")

    state = twophase.run(state, t_end, g, cfg, callback=check)
    assert not failures, failures[:5]

    cx, cy = (float(v) for v in center_of_mass(state.vf, g))
    t = float(state.flow.t)
    # final drop center within tolerance of the advected position
    # (test/MovingDrop.cpp:340-380; the heavy drop barely decelerates)
    assert abs(cx - (cx0 + u_drop * t)) < 3.0 * g.dx, (cx, cx0 + u_drop * t)
    assert abs(cy - cy0) < 3.0 * g.dx, (cy, cy0)
