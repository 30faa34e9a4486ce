"""Golden-trajectory case definitions (shared by tools/make_goldens.py and
tests/test_golden.py).

SURVEY.md S4 recommends golden-field comparisons against the reference's
.npy dumps (src/IO.hpp:25-92). The C++ reference cannot run here, so the
anchors are *self*-golden: short f64 CPU trajectories committed as npz.
Any silent drift in a core op (stencils, VOF, curvature, pressure solve,
projection) breaks the fast f64 comparison; the f32 rerun of the same
trajectory pins the documented cross-dtype bound.

Determinism notes:
- dt_max is chosen to be the binding timestep constraint, so the step
  count (and hence the trajectory) is fixed.
- the two-phase case pins pressure (nonsingular operator); the cavity is
  all-Dirichlet and pinned too, so no nullspace gauge enters the fields.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import incomp, twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.solvers.state import init_flow_state
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


def two_phase_drop(dtype=None):
    """Gravity-driven drop, 64^2, 1000:1 density ratio, surface tension.

    15 fixed steps of dt=2.5e-3 (capillary limit ~0.12 >> dt_max, so dt_max
    binds every step). Exercises the full two-phase chain: ELVIRA PLIC,
    unsplit advection, curvature, ST pressure jump, BoxMG-PCG, projection.
    """
    n = 64
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-3, visc_liquid=1e-2,
        sigma=0.02, cfl_max=0.5, dt_max=2.5e-3, num_subiter=2,
        pressure_tol=1e-10, pressure_max_iter=200, pressure_pin="right",
        bcs=bc.FlowBCs(bc.Neumann(), bc.Neumann(), bc.Neumann(), bc.Neumann()),
        gravity=(0.0, -1.0),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.5) ** 2 + (y - 0.65) ** 2 <= 0.2 ** 2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=dtype)
    t_end = 15 * 2.5e-3

    def run():
        st = twophase.run(state, t_end, g, cfg)
        return {
            "U": st.flow.U, "V": st.flow.V, "p": st.flow.p, "vf": st.vf,
            "curv": st.curv, "t": jnp.asarray(st.flow.t),
        }

    return run


def lid_driven_cavity(dtype=None):
    """Lid-driven cavity, 64^2, Re=400, 25 fixed steps of dt=4e-3.

    (CFL limit at |u|<=1 is 0.5*dx=7.8e-3 > dt_max.) Exercises the
    single-phase path: hybrid upwind momentum, all-Dirichlet walls with a
    fn-valued moving lid, pinned pressure, projection.
    """
    n = 64
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1.0, visc_gas=2.5e-3, visc_liquid=2.5e-3,
        cfl_max=0.5, dt_max=4e-3, num_subiter=2,
        pressure_tol=1e-10, pressure_max_iter=200, pressure_pin="right",
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=1.0, v=0.0),
        ),
    )
    state = init_flow_state(g, 1.0, 2.5e-3, dtype=dtype)
    U, V = bc.apply_velocity_bcs(state.U, state.V, g, cfg.bcs)
    state = dataclasses.replace(state, U=U, V=V)
    t_end = 25 * 4e-3

    def run():
        st = incomp.run(state, t_end, g, cfg)
        return {"U": st.U, "V": st.V, "p": st.p, "t": jnp.asarray(st.t)}

    return run


CASES = {
    "two_phase_drop": two_phase_drop,
    "lid_driven_cavity": lid_driven_cavity,
}
