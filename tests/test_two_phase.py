"""Two-phase solver integration tests.

StationaryDrop (test/StationaryDrop.cpp:18-412): an elliptical drop with
surface tension and a 1000:1 density ratio, all-Neumann box, pinned-right
pressure. Per step: vf stays in [-1e-8, 1+1e-8], volume loss < 1e-8, no NaNs
in curvature/pressure/velocity.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

FULL = os.environ.get("FS_FULL_TESTS") == "1"


def _drop_setup(n=64):
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-3, visc_liquid=1e-3,
        sigma=1.0 / 20.0, cfl_max=0.5, dt_max=1e-1, num_subiter=3,
        pressure_tol=1e-6, pressure_max_iter=50, pressure_pin="right",
        bcs=bc.FlowBCs(bc.Neumann(), bc.Neumann(), bc.Neumann(), bc.Neumann()),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (2.0 * (x - 0.5)) ** 2 + (y - 0.5) ** 2 <= 0.25**2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0)
    return g, cfg, state


@pytest.mark.slow
def test_stationary_drop():
    t_end = 5.0 if FULL else 0.6
    g, cfg, state = _drop_setup()
    init_int = float(jnp.sum(state.vf)) * g.dx * g.dy

    failures = []

    def check(s):
        vmin = float(jnp.min(s.vf))
        vmax = float(jnp.max(s.vf))
        loss = init_int - float(jnp.sum(s.vf)) * g.dx * g.dy
        t = float(s.flow.t)
        if vmin < -1e-8:
            failures.append(f"t={t}: vf_min={vmin:.3e}")
        if vmax > 1.0 + 1e-8:
            failures.append(f"t={t}: vf_max={vmax:.3e}")
        if abs(loss) > 1e-8:
            failures.append(f"t={t}: vol loss={loss:.3e}")
        for name, arr in [("U", s.flow.U), ("p", s.flow.p), ("curv", s.curv)]:
            if bool(jnp.any(jnp.isnan(arr))):
                failures.append(f"t={t}: NaN in {name}")

    state = twophase.run(state, t_end, g, cfg, callback=check)
    assert not failures, failures[:5]
    assert float(state.flow.t) >= t_end - 1e-12

    # physics: Laplace pressure jump delta_p ~ sigma*kappa. For the relaxed
    # (circularized) drop radius r_eq: kappa = 1/r_eq. Loose sanity band.
    p = np.asarray(state.flow.p)
    p_in = p[33, 33]
    p_out = p[5, 5]
    area = init_int
    r_eq = np.sqrt(area / np.pi)
    laplace = cfg.sigma / r_eq
    ratio = (p_in - p_out) / laplace
    assert 0.5 < ratio < 2.0, f"Laplace jump ratio {ratio:.3f}"


def test_two_phase_smoke():
    # a short run exercising the full coupled step (advection + curvature +
    # pressure jump + consistent transport) — quick-suite variant
    g, cfg, state = _drop_setup(n=32)
    init_int = float(jnp.sum(state.vf)) * g.dx * g.dy
    state = twophase.run(state, 0.12, g, cfg)
    assert float(state.flow.t) >= 0.12 - 1e-12
    assert not bool(jnp.any(jnp.isnan(state.flow.U)))
    assert not bool(jnp.any(jnp.isnan(state.flow.p)))
    loss = init_int - float(jnp.sum(state.vf)) * g.dx * g.dy
    assert abs(loss) < 1e-8, loss
    assert float(jnp.min(state.vf)) > -1e-8
    assert float(jnp.max(state.vf)) < 1.0 + 1e-8


@pytest.mark.parametrize("tol_inter", [1e-4, 3e-4])
def test_intermediate_tol_matches_reference_behavior(tol_inter):
    """cfg.pressure_tol_intermediate (loose intermediate subiteration
    solves, tight final) must leave the end-of-step state at the
    reference-behavior solution to ~rounding and still meet pressure_tol
    on the final solve (measured study: config.py / PERF.md). Round-5
    gate runs: the paired TPU A/B measured 1e-3 at -7.6 ms/step vs 1e-4
    at 1024² (artifacts/ab_matrix_r5.jsonl) but 1e-3 FAILS this gate by
    a hair (max|dU| 1.007e-7 vs the 1e-7 reference-equal standard) —
    the headroom stays unclaimed rather than weakening the standard;
    3e-4 is the loosest level that passes."""
    import dataclasses

    g, cfg, state0 = _drop_setup(n=32)
    base = twophase.run(state0, 0.12, g, cfg)
    cfg_l = dataclasses.replace(cfg, pressure_tol_intermediate=tol_inter)
    loose = twophase.run(state0, 0.12, g, cfg_l)

    assert float(loose.flow.p_res) <= cfg.pressure_tol
    assert float(jnp.max(jnp.abs(base.flow.U - loose.flow.U))) < 1e-7
    assert float(jnp.max(jnp.abs(base.vf - loose.vf))) < 1e-8
    # and it actually saved pressure work on the last step
    assert int(loose.flow.p_iter) <= int(base.flow.p_iter)
