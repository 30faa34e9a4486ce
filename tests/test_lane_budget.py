"""Lane-budget proof for the headline bench config (VERDICT r2 #7).

bench.py times a drop-in-channel at 1024² with the DEFAULT sparse-VOF lane
budget (vof/advect.default_max_active = 16*N for N >= 256). Overflow is
loud (inf vol_err), but nothing had demonstrated the default budget
actually survives developed flow at the bench config. This runs the exact
bench geometry at a scaled proxy with the IDENTICAL budget-to-resolution
ratio (budget/N = 16 in both regimes) to developed flow and asserts:

  (a) no lane overflow ever (vol_err stays finite), and
  (b) the measured peak mixed-cell count leaves >= 4x headroom, so the
      1024² run — whose interface-to-budget ratio is the same by scaling —
      cannot plausibly overflow either.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.constants import vf_cutoffs
from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.vof.advect import default_max_active
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


def _bench_case(n):
    # EXACT bench.py geometry/config (keep in sync with bench.py::_run)
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=0.5, v=0.0), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
        pressure_tol_intermediate=1e-4,
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    return g, cfg, state


def _run_and_track(n, steps):
    g, cfg, state = _bench_case(n)
    budget = default_max_active(n, n)
    if n >= 256:  # the 16*N regime — same budget/N ratio as 1024²
        assert budget == 16 * n, (budget, n)
    step = twophase.make_step(g, cfg)
    lo, hi = vf_cutoffs(jnp.float32)
    peak_mixed = 0
    for _ in range(steps):
        state = step(state, 1e9)
        assert np.isfinite(float(state.vof_vol_error)), (
            "lane overflow (inf vol_err) — budget too small for the bench "
            "config")
        vf = state.vf
        mixed = int(jnp.sum((vf > lo) & (vf < hi)))
        peak_mixed = max(peak_mixed, mixed)
    return peak_mixed, budget


@pytest.mark.slow
def test_lane_budget_bench_proxy_developed():
    # 30 steps ≈ bench warmup (20) + timed batch; the drop crosses the
    # shear layer and deforms — the interface-stretch regime the budget
    # must survive
    peak, budget = _run_and_track(256, 30)
    assert peak * 4 <= budget, (
        f"peak mixed cells {peak} within 4x of budget {budget}")


def test_lane_budget_bench_proxy_quick():
    peak, budget = _run_and_track(96, 6)
    assert peak * 4 <= budget, (peak, budget)
