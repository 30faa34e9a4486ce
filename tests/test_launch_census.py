"""Kernel-launch (fusion-count) regression bounds for the hot paths.

Launch count is the cost model for the tunnel's degraded/timeable windows
(PERF.md): step time ~ launches x 10-50 us there. These bounds sit ~20%
above the measured counts at the time of writing (tools/launch_count.py)
— a regression past them means some restructuring silently exploded the
kernel count. CPU HLO fusion counts; XLA default paths (the fused Pallas
paths are TPU-gated).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid


def _nfus(fn, *args):
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    return len(re.findall(r" fusion\(", hlo))


@pytest.mark.slow
def test_launch_census_bounds():
    from fluidsolver_tpu.core import bc
    from fluidsolver_tpu.poisson import boxmg, linsys
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.solvers.config import SolverConfig
    from fluidsolver_tpu.vof import advect as adv
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator
    from fluidsolver_tpu.ops import stencil

    n = 128
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    vf = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g
    ).astype(jnp.float32)
    U = jnp.ones((g.nx + 3, g.ny + 2), jnp.float32)
    V = 0.5 * jnp.ones((g.nx + 2, g.ny + 3), jnp.float32)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)

    assert _nfus(lambda v: plic.elvira(v, g.dx, g.dy), vf) <= 85  # was 68
    rec = plic.elvira(vf, g.dx, g.dy)
    assert _nfus(
        lambda v, r: adv.advect(v, r, U, V, Ui, Vi, g, 1e-4), vf, rec
    ) <= 165  # was 136 (212 before gather batching)

    rng = np.random.default_rng(0)
    rho_u = jnp.asarray(
        np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0), jnp.float32)
    rho_v = jnp.asarray(
        np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0), jnp.float32)
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    b = jnp.zeros(g.shape_center, jnp.float32)
    assert _nfus(boxmg.build_hierarchy, op) <= 700  # was 585
    levels = boxmg.build_hierarchy(op)
    assert _nfus(boxmg.v_cycle, levels, b) <= 125  # was 102

    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=0.5, v=0.0), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
    )
    state = twophase.init_two_phase_state(g, cfg, vf, dtype=jnp.float32)
    step = twophase.make_step(g, cfg)
    assert _nfus(step, state, 1e9) <= 1550  # was 1299
