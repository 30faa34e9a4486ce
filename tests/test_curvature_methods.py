"""The two alternative curvature estimators (src/Curvature.hpp:272-369) and
the alternative pressure-solver backends."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.curvature import (
    curvature_convolved_vf,
    curvature_quad_regression,
)
from geom_util import circle_cell_fractions


def _setup(n=64, r=0.25):
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    vf = jnp.asarray(circle_cell_fractions(g, 0.5, 0.5, r))
    rec = plic.elvira(vf, g.dx, g.dy)
    return g, vf, rec


def test_quad_regression_circle():
    g, vf, rec = _setup()
    c = np.asarray(curvature_quad_regression(vf, rec, g))[np.asarray(rec.valid)]
    rel = np.abs(c - 4.0) / 4.0
    assert np.median(rel) < 0.05, float(np.median(rel))


def test_convolved_circle():
    g, vf, rec = _setup()
    c = np.asarray(curvature_convolved_vf(vf, rec, g))[np.asarray(rec.valid)]
    rel = np.abs(c - 4.0) / 4.0
    # the convolved estimator is the coarsest of the three (kernel-width bias)
    assert np.median(rel) < 0.15, float(np.median(rel))
    # FS_CURV_NO_INTERPOLATION variant
    c2 = np.asarray(curvature_convolved_vf(vf, rec, g, interpolate=False))[np.asarray(rec.valid)]
    assert np.median(np.abs(c2 - 4.0) / 4.0) < 0.2


def test_direct_pressure_solver_matches_pcg():
    from fluidsolver_tpu.poisson import cg, linsys
    from fluidsolver_tpu.poisson.direct import solve_direct

    g = make_grid(0.0, 1.0, 12, 0.0, 1.0, 10)
    rng = np.random.default_rng(3)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    b = rng.normal(size=g.shape_center)
    b -= b.mean()
    b = jnp.asarray(b)
    x_direct = solve_direct(op, b, singular=True)
    x_pcg, rel, _ = cg.solve_pcg(op, b, 1e-12, 2000, singular=True)
    np.testing.assert_allclose(np.asarray(x_direct), np.asarray(x_pcg), atol=1e-7)
    # residual of the direct solve is machine-level
    r = np.asarray(linsys.apply_op(op, x_direct) - b)
    assert np.abs(r).max() < 1e-8


def test_immersed_interface_case_runs():
    from fluidsolver_tpu.cases import get_case
    from fluidsolver_tpu.ib import markers as mk

    case = get_case("immersed_interface", n=24, n_markers=40)
    state = case.make_state()
    step = case.make_step()
    for _ in range(5):
        state = step(state, 1e9)
    assert not bool(jnp.any(jnp.isnan(state.flow.U)))
    assert not bool(jnp.any(jnp.isnan(state.markers.x)))
    # lid-driven flow drags the top of the ring: markers must have moved
    disp = float(jnp.max(jnp.abs(state.markers.x - state.markers.x0)))
    assert disp > 1e-6
    jumps = mk.jump_conditions(state.markers, 1.0, 1.0)
    assert np.all(np.isfinite(np.asarray(jumps["p_jump"])))
