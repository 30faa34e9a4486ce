"""Vectorized momentum/density RHS vs the loop-based numpy oracle.

The oracle (tests/oracle.py) is a direct transcription of the discrete
formulas in src/FS.hpp:158-406; agreement to machine precision validates all
staggered index shifts in fluidsolver_tpu/ops/momentum.py.
"""

import jax.numpy as jnp
import numpy as np

import oracle
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import momentum

RNG = np.random.default_rng(42)


def _random_fields(g):
    U = RNG.normal(size=g.shape_u)
    V = RNG.normal(size=g.shape_v)
    # densities: two-phase-like with jumps to exercise the hybrid upwinding
    rho_u = np.where(RNG.random(g.shape_u) > 0.5, 1000.0, 1.0)
    rho_v = np.where(RNG.random(g.shape_v) > 0.5, 1000.0, 1.0)
    visc = RNG.random(g.shape_center) + 0.1
    p = RNG.normal(size=g.shape_center)
    pj_u = RNG.normal(size=g.shape_u)
    pj_v = RNG.normal(size=g.shape_v)
    return U, V, rho_u, rho_v, visc, p, pj_u, pj_v


def test_dmomdt_matches_oracle():
    g = make_grid(0.0, 1.0, 7, 0.0, 2.0, 5)
    U, V, rho_u, rho_v, visc, p, pj_u, pj_v = _random_fields(g)
    rho_eps = momentum.calc_rho_eps(1.0, 1000.0)

    got_u, got_v = momentum.calc_dmomdt(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(rho_u), jnp.asarray(rho_v),
        jnp.asarray(visc), jnp.asarray(p), jnp.asarray(pj_u), jnp.asarray(pj_v),
        g.dx, g.dy, rho_eps,
    )
    exp_u, exp_v = oracle.calc_dmomdt(
        g.nx, g.ny, U, V, rho_u, rho_v, visc, p, pj_u, pj_v, g.dx, g.dy, rho_eps
    )
    np.testing.assert_allclose(np.asarray(got_u), exp_u, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_v), exp_v, rtol=1e-12, atol=1e-12)


def test_drhodt_matches_oracle():
    g = make_grid(0.0, 1.0, 6, 0.0, 1.0, 9)
    U, V, rho_u, rho_v, *_ = _random_fields(g)
    rho_eps = momentum.calc_rho_eps(1.0, 1000.0)

    got_u, got_v = momentum.calc_drhodt(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(rho_u), jnp.asarray(rho_v),
        g.dx, g.dy, rho_eps,
    )
    exp_u, exp_v = oracle.calc_drhodt(g.nx, g.ny, U, V, rho_u, rho_v, g.dx, g.dy, rho_eps)
    np.testing.assert_allclose(np.asarray(got_u), exp_u, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_v), exp_v, rtol=1e-12, atol=1e-12)


def test_hybrid_interp_scalar_semantics():
    rho_eps = 1e-3
    # small jump -> central
    r, v = momentum.hybrid_interp(rho_eps, 1.0, 1.0005, 2.0, 4.0, 1.0, 1.0)
    assert np.isclose(float(r), 1.00025) and np.isclose(float(v), 3.0)
    # big jump, positive transport -> minus side
    r, v = momentum.hybrid_interp(rho_eps, 1.0, 1000.0, 2.0, 4.0, 1.0, 1.0)
    assert float(r) == 1.0 and float(v) == 2.0
    # big jump, negative transport -> plus side
    r, v = momentum.hybrid_interp(rho_eps, 1.0, 1000.0, 2.0, 4.0, -1.0, -1.0)
    assert float(r) == 1000.0 and float(v) == 4.0


def test_mix_visc_harmonic_and_cutoffs():
    g = make_grid(0.0, 1.0, 4, 0.0, 1.0, 4)
    vf = jnp.zeros(g.shape_center).at[2, 2].set(0.5).at[3, 3].set(1.0)
    visc = momentum.mix_visc(vf, 1e-6, 1e-3)
    assert np.isclose(float(visc[1, 1]), 1e-6)          # pure gas
    assert np.isclose(float(visc[3, 3]), 1e-3)          # pure liquid
    harm = (1e-3 * 1e-6) / (1e-3 * 0.5 + 1e-6 * 0.5)    # mixed: harmonic
    assert np.isclose(float(visc[2, 2]), harm)


def test_mix_rho_staggered():
    g = make_grid(0.0, 1.0, 4, 0.0, 1.0, 4)
    vf = jnp.zeros(g.shape_center).at[2, 2].set(1.0)
    rho_u = jnp.zeros(g.shape_u)
    rho_v = jnp.zeros(g.shape_v)
    rho_u, rho_v = momentum.mix_rho_staggered(vf, 1.0, 1000.0, rho_u, rho_v)
    # face between cell (2,2)[liquid] and (1,2)[gas]: mean of 1000 and 1
    assert np.isclose(float(rho_u[2, 2]), 0.5 * (1000.0 + 1.0))
    # face far from the drop: pure gas
    assert np.isclose(float(rho_u[4, 4]), 1.0)
    # ghost ring must be Neumann-filled (no zeros anywhere)
    assert float(jnp.min(rho_u)) >= 1.0
    assert float(jnp.min(rho_v)) >= 1.0


def test_conserved_quantities_uniform():
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 8)
    U = jnp.full(g.shape_u, 2.0)
    V = jnp.full(g.shape_v, -1.0)
    rho_u = jnp.full(g.shape_u, 3.0)
    rho_v = jnp.full(g.shape_v, 3.0)
    mass, mx, my = momentum.conserved_quantities(U, V, rho_u, rho_v, g.dx, g.dy)
    assert np.isclose(float(mass), 3.0)
    assert np.isclose(float(mx), 6.0)
    assert np.isclose(float(my), -3.0)


def test_adjust_dt_limits():
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 8)
    U = jnp.full(g.shape_u, 2.0)
    V = jnp.zeros(g.shape_v)
    rho_u = jnp.ones(g.shape_u)
    rho_v = jnp.ones(g.shape_v)
    visc = jnp.zeros(g.shape_center)
    dt = momentum.adjust_dt(U, V, rho_u, rho_v, visc, g.dx, g.dy, 1.0, 1.0, 0.0, 0.9, 1e9)
    # pure convective limit: 0.9 / (2 / dx)
    assert np.isclose(float(dt), 0.9 / (2.0 / g.dx))
    # dt_max cap
    dt = momentum.adjust_dt(U, V, rho_u, rho_v, visc, g.dx, g.dy, 1.0, 1.0, 0.0, 0.9, 1e-4)
    assert np.isclose(float(dt), 1e-4)
