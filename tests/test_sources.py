"""Mass-source cases: growing solid and expanding bubble."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.cases import get_case


def test_growing_ib_pushes_flow_out():
    # the growing solid must displace fluid: outflow exceeds inflow by the
    # volume source (GrowingIB physics)
    case = get_case("growing_ib", ny=24, r0=0.15, drdt=0.1)
    g = case.grid
    state = case.make_state()
    step = case.make_step()
    for _ in range(10):
        state = step(state, 1e9)
    U = np.asarray(state.U)
    assert not np.any(np.isnan(U))
    rho_u = np.asarray(state.rho_u)
    inflow = float(np.sum(rho_u[1, 1:-1] * U[1, 1:-1]) * g.dy)
    outflow = float(np.sum(rho_u[-2, 1:-1] * U[-2, 1:-1]) * g.dy)
    r = case.meta["r0"] + case.meta["drdt"] * float(state.t)
    expected_source = 3.0 / r * case.meta["drdt"] * np.pi * r**2  # (3/r)drdt * area
    assert outflow - inflow > 0.3 * expected_source, (inflow, outflow, expected_source)


def test_expanding_bubble_grows():
    case = get_case("expanding_bubble", n=48, m_dot=1.0)
    g = case.grid
    state = case.make_state()
    step = case.make_step()
    gas0 = float(jnp.sum(1.0 - state.vf[1:-1, 1:-1])) * g.dx * g.dy
    n_steps = 25
    for _ in range(n_steps):
        state = step(state, 1e9)
    assert not bool(jnp.any(jnp.isnan(state.flow.U)))
    gas1 = float(jnp.sum(1.0 - state.vf[1:-1, 1:-1])) * g.dx * g.dy
    # expected growth rate: m_dot*A*(1/rho_g - 1/rho_l) ~ 2*pi*r*m_dot/rho_g
    r = 0.15
    expected = 2.0 * np.pi * r * 1.0 * float(state.flow.t)
    growth = gas1 - gas0
    assert growth > 0.3 * expected, (gas0, gas1, expected)
    # vf stays in bounds
    assert float(jnp.min(state.vf)) > -1e-8
    assert float(jnp.max(state.vf)) < 1.0 + 1e-8
