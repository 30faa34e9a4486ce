"""Registry integrity: every registered case builds at a small size and
advances a few steps without producing NaNs. Physics-specific checks live
in the dedicated test files; this guards the full case inventory
(SURVEY.md §2 C24-C29)."""

import dataclasses

import jax.numpy as jnp
import pytest

from fluidsolver_tpu.cases import get_case, list_cases

# case -> small-size kwargs (keep each under ~10 s of CPU)
SMALL = {
    "capillary_wave": dict(ny=16),
    "channel_with_drop": dict(ny=16),
    "diffuse_ib_channel": dict(ny=16),
    "diffuse_ib_dfg": dict(ny=16),
    "expanding_bubble": dict(n=24),
    "growing_ib": dict(ny=16),
    "immersed_interface": dict(n=16),
    "incomp_channel": dict(ny=12),
    "lid_driven": dict(n=17),
    "luchini_ib_channel": dict(ny=16),
    "luchini_ib_dfg": dict(ny=16),
    "rising_bubble": dict(nx=12),
    "sharp_ib_channel": dict(ny=16),
    "sharp_ib_dfg": dict(ny=16),
    "slow_channel": dict(level=4),
    "stationary_drop": dict(n=16),
    "taylor_green": dict(n=16),
    "two_phase_channel": dict(ny=12),
    "vof_tgv": dict(n=32),
    "wall_bubble": dict(ny=12),
    "wave": dict(ny=12),
}


def test_registry_covers_small_map():
    assert set(list_cases()) == set(SMALL), set(list_cases()) ^ set(SMALL)


@pytest.mark.parametrize("name", sorted(SMALL))
def test_case_steps_finite(name):
    case = get_case(name, **SMALL[name])
    state = case.make_state()
    step = case.make_step()
    for _ in range(3):
        state = step(state, 1e9)
    flow = state.flow if hasattr(state, "flow") else state
    assert bool(jnp.all(jnp.isfinite(flow.U))), f"{name}: non-finite U"
    assert bool(jnp.all(jnp.isfinite(flow.p))), f"{name}: non-finite p"
    assert float(flow.t) > 0.0
    if hasattr(state, "vf"):
        assert bool(jnp.all(jnp.isfinite(state.vf))), f"{name}: non-finite vf"
