"""FS_NAN_POISON scratch-poisoning debug mode (src/FS.hpp:163-171 parity).

The reference fills its static flux scratch with quiet_NaN so any stencil
that reads an un-written cell poisons the result. Here the synthesized
ghost rings of ``ops.momentum._pad1`` play the role of un-written scratch:
under FS_NAN_POISON=1 they are NaN, a buggy consumer trips instantly, and
a correct solver run is bit-identical to the unpoisoned one.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import momentum as mom
from fluidsolver_tpu.solvers import twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


def _dmom(n=12):
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(size=(n + 3, n + 2)))
    V = jnp.asarray(rng.normal(size=(n + 2, n + 3)))
    rho_u = jnp.asarray(1.0 + rng.uniform(size=(n + 3, n + 2)))
    rho_v = jnp.asarray(1.0 + rng.uniform(size=(n + 2, n + 3)))
    visc = jnp.asarray(rng.uniform(size=(n + 2, n + 2)))
    p = jnp.asarray(rng.normal(size=(n + 2, n + 2)))
    return mom.calc_dmomdt(
        U, V, rho_u, rho_v, visc, p, jnp.zeros_like(rho_u), jnp.zeros_like(rho_v),
        0.1, 0.1, 1e-6,
    )


def test_unwritten_cell_trips_poison(monkeypatch):
    monkeypatch.setenv("FS_NAN_POISON", "1")
    dmomU, dmomV = _dmom()

    # the synthesized ring IS poisoned...
    assert bool(jnp.all(jnp.isnan(dmomU[0, :]))) and bool(jnp.all(jnp.isnan(dmomV[:, -1])))
    # ...so a buggy stencil that consumes an un-written ghost cell trips
    buggy = 0.5 * (dmomU[:-1, :] + dmomU[1:, :])  # touches the ghost column
    assert bool(jnp.any(jnp.isnan(buggy)))
    # a whole-array reduction (the classic silent-zero consumer) trips too
    assert bool(jnp.isnan(jnp.sum(dmomU)))

    # ...while every correct consumer reads [1:-1,1:-1] only and stays clean
    assert not bool(jnp.any(jnp.isnan(dmomU[1:-1, 1:-1])))
    assert not bool(jnp.any(jnp.isnan(dmomV[1:-1, 1:-1])))


def test_poisoned_solver_run_is_bit_identical(monkeypatch):
    """A short two-phase run under FS_NAN_POISON=1 must match the
    unpoisoned run exactly: no production stencil consumes a synthesized
    ghost (if one did, NaNs would appear instead of silent zeros)."""
    n = 24
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=100.0, visc_gas=1e-3, visc_liquid=1e-2,
        sigma=0.02, cfl_max=0.5, dt_max=5e-2, num_subiter=2,
        pressure_tol=1e-8, pressure_max_iter=60, pressure_pin="right",
        bcs=bc.FlowBCs(bc.Neumann(), bc.Neumann(), bc.Neumann(), bc.Neumann()),
        gravity=(0.0, -1.0),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.5) ** 2 + (y - 0.6) ** 2 <= 0.2**2, g
    )

    runs = {}
    for poison in ("0", "1"):
        monkeypatch.setenv("FS_NAN_POISON", poison)
        state = twophase.init_two_phase_state(g, cfg, vf0)
        state = twophase.run(state, 0.1, g, cfg)
        runs[poison] = state

    for name in ("U", "V", "p"):
        a = np.asarray(getattr(runs["0"].flow, name))
        b = np.asarray(getattr(runs["1"].flow, name))
        assert not np.any(np.isnan(b[1:-1, 1:-1])), f"poison leaked into {name}"
        np.testing.assert_array_equal(a[1:-1, 1:-1], b[1:-1, 1:-1], err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(runs["0"].vf)[1:-1, 1:-1], np.asarray(runs["1"].vf)[1:-1, 1:-1]
    )
