"""Rising bubble: buoyancy accelerates the gas phase upward
(examples/RisingBubble.cpp; fluid data Meulenbroek 2021). Early-time check:
the bubble's vf-weighted vertical velocity grows ~ linearly with t and is
positive; mass stays conserved."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.cases import get_case
from fluidsolver_tpu.utils.diagnostics import avg_phase_velocity, center_of_mass


@pytest.mark.slow
def test_rising_bubble_accelerates_upward():
    case = get_case("rising_bubble", nx=32)
    g = case.grid
    state = case.make_state()
    step = case.make_step()

    init_liquid = float(jnp.sum(state.vf)) * g.dx * g.dy
    vys = []
    for k in range(100):
        state = step(state, 1e9)
        if k % 20 == 19:
            _, vy = avg_phase_velocity(1.0 - state.vf, state.flow.U, state.flow.V)
            vys.append(float(vy))

    assert not bool(jnp.any(jnp.isnan(state.flow.U)))
    # upward and accelerating
    assert vys[-1] > 0.0, vys
    assert vys[-1] > vys[0], vys
    # magnitude ballpark: v ~ g*t*(1 - rho_g/rho_l) at early times
    t = float(state.flow.t)
    v_expected = 9.80665 * t
    assert 0.2 * v_expected < vys[-1] < 2.0 * v_expected, (vys[-1], v_expected)
    # liquid volume conserved (interface far from boundaries)
    liquid = float(jnp.sum(state.vf)) * g.dx * g.dy
    assert abs(liquid - init_liquid) < 1e-10 * init_liquid + 1e-12

    # dimensionless numbers of the configuration (RisingBubble.cpp:44-124)
    assert np.isclose(case.meta["Eo"], 1e3 * 9.80665 * (2 * 5.6e-4) ** 2 / 0.072)
    assert case.meta["rho_ratio"] > 1e4
