"""Simulation state pytrees.

The reference's ``FS`` struct + ``State`` pair (src/FS.hpp:15-52) become one
flat JAX pytree so a whole time step is a pure ``state -> state`` function
that jit/scan/shard_map can transform.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fluidsolver_tpu.core import fields
from fluidsolver_tpu.core.fields import register_pytree_dataclass
from fluidsolver_tpu.core.grid import Grid


def end_tolerance(dtype, t_end: float) -> float:
    """Dtype-aware 'reached t_end' tolerance for the run loops.

    In f32 the accumulated time carries O(n_steps * ulp(t)) rounding error,
    so after the last intended step ``t`` can sit a few ULP short of
    ``t_end``. The old absolute 1e-14 guard then admits one more 'residue
    step' whose dt is pure roundoff (~1e-9): the Poisson RHS scales with
    1/dt, which amplifies f32 rounding noise into O(1) pressure junk
    (caught by tests/test_golden.py::test_golden_f32_two_phase_drop).
    Must equal the ``clamp_dt_to_end`` snap threshold: a remaining time
    above this tolerance is never snapped, so the run loop always makes
    progress."""
    eps = float(jnp.finfo(jnp.dtype(dtype)).eps)
    return max(1e-14, 64.0 * eps * abs(float(t_end)))


def clamp_dt_to_end(dt, t, t_end):
    """min(dt, t_end - t), with sub-roundoff residues snapped to EXACTLY
    zero — the step functions no-op on dt == 0 (trailing scan steps), so
    the snap turns the f32 'residue step' into that same safe no-op."""
    remaining = t_end - t
    tiny = 64.0 * jnp.finfo(remaining.dtype).eps * jnp.maximum(
        jnp.abs(jnp.asarray(t_end, remaining.dtype)), jnp.abs(t))
    remaining = jnp.where(remaining <= tiny, 0.0, remaining)
    return jnp.minimum(dt, remaining)


@register_pytree_dataclass
@dataclasses.dataclass
class FlowState:
    """Staggered flow state incl. the ``old`` copy used by the subiterated
    Crank-Nicolson scheme (src/FS.hpp:76-97)."""

    # current
    U: jnp.ndarray
    V: jnp.ndarray
    rho_u: jnp.ndarray
    rho_v: jnp.ndarray
    # previous time level
    U_old: jnp.ndarray
    V_old: jnp.ndarray
    rho_u_old: jnp.ndarray
    rho_v_old: jnp.ndarray
    # cell-centered
    p: jnp.ndarray
    visc: jnp.ndarray
    # staggered surface-tension pressure jump
    p_jump_u: jnp.ndarray
    p_jump_v: jnp.ndarray
    # time
    t: jnp.ndarray
    dt: jnp.ndarray
    # solver diagnostics (updated every step)
    p_res: jnp.ndarray
    p_iter: jnp.ndarray


def init_flow_state(grid: Grid, rho: float, visc: float, dtype=None) -> FlowState:
    """Quiescent single-phase state."""
    z = jnp.zeros((), dtype=dtype)
    return FlowState(
        U=fields.zeros_u(grid, dtype),
        V=fields.zeros_v(grid, dtype),
        rho_u=fields.full_u(grid, rho, dtype),
        rho_v=fields.full_v(grid, rho, dtype),
        U_old=fields.zeros_u(grid, dtype),
        V_old=fields.zeros_v(grid, dtype),
        rho_u_old=fields.full_u(grid, rho, dtype),
        rho_v_old=fields.full_v(grid, rho, dtype),
        p=fields.zeros_center(grid, dtype),
        visc=fields.full_center(grid, visc, dtype),
        p_jump_u=fields.zeros_u(grid, dtype),
        p_jump_v=fields.zeros_v(grid, dtype),
        t=z,
        dt=z,
        p_res=z,
        p_iter=jnp.zeros((), jnp.int32),
    )


def save_old(state: FlowState) -> FlowState:
    """State rotation (src/FS.hpp:76-97)."""
    return dataclasses.replace(
        state, U_old=state.U, V_old=state.V, rho_u_old=state.rho_u, rho_v_old=state.rho_v
    )
