"""Scan-based fixed-step runners: one dispatch, trailing steps clamp to
dt=0 no-ops, trajectory matches the host loop."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.cases import get_case
from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import incomp, twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.solvers.state import init_flow_state


def test_incomp_scan_matches_host_loop():
    g = make_grid(0.0, 1.0, 16, 0.0, 1.0, 16)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1.0, visc_gas=1e-2, visc_liquid=1e-2,
        cfl_max=0.9, dt_max=2e-2, num_subiter=2,
        bcs=bc.FlowBCs(bc.Dirichlet(), bc.Dirichlet(), bc.Dirichlet(),
                       bc.Dirichlet(u=1.0, v=0.0)),
    )
    state0 = init_flow_state(g, 1.0, 1e-2)
    U, V = bc.apply_velocity_bcs(state0.U, state0.V, g, cfg.bcs)
    state0 = dataclasses.replace(state0, U=U, V=V)

    host = incomp.run(state0, 0.1, g, cfg)

    # 5 real steps reach t_end=0.1 at dt_max=2e-2; 3 extra steps must no-op
    run8 = incomp.make_scan_runner(g, cfg, n_steps=8)
    scanned = run8(state0, 0.1)

    assert np.isclose(float(scanned.t), 0.1)
    np.testing.assert_allclose(np.asarray(scanned.U), np.asarray(host.U), atol=1e-12)
    np.testing.assert_allclose(np.asarray(scanned.p), np.asarray(host.p), atol=1e-12)


def test_two_phase_scan_runner():
    case = get_case("stationary_drop", n=16)
    state = case.make_state()
    runner = twophase.make_scan_runner(case.grid, case.cfg, n_steps=4)
    out = runner(state, 1e9)
    assert bool(jnp.all(jnp.isfinite(out.flow.U)))
    assert bool(jnp.all(jnp.isfinite(out.vf)))
    assert float(out.flow.t) > 0.0
