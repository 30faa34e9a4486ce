"""Taylor-Green-vortex VOF kinematics (test/TaylorGreenVortexVOF.cpp).

A circle advected through the analytic decaying TGV velocity, re-prescribed
each step; per step: vf bounds within VF_LOW, mass conserved to 1e-10,
backtracked volume error < 1e-12 (the reference's 1e-15 assumes its exact
polyhedron arithmetic; the octagon construction accumulates a few more ulps).
``scale`` exercises the scale-invariance path (the Tiny variant at 1e-4).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.vof import advect as adv
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

VISC, RHO = 0.1, 0.9
FULL = os.environ.get("FS_FULL_TESTS") == "1"


def _velocity(g, t, scale):
    F = np.exp(-2.0 * VISC / RHO * t)
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    U = scale * np.sin(Xu / scale) * np.cos(Yu / scale) * F
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    V = -scale * np.cos(Xv / scale) * np.sin(Yv / scale) * F
    return jnp.asarray(U), jnp.asarray(V)


@pytest.mark.parametrize("scale", [1.0, 1e-4])
def test_taylor_green_vof(scale):
    n = 128 if FULL else 64
    t_end = 5.0 if FULL else 0.6
    g = make_grid(0.0, 2 * np.pi * scale, n, 0.0, 2 * np.pi * scale, n)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x / scale - np.pi) ** 2 + (y / scale - 1.5 * np.pi) ** 2 <= 0.25,
            g,
        )
    )
    init_int = float(jnp.sum(vf)) * g.dx * g.dy

    @jax.jit
    def one(vf, U, V, dt):
        Ui = stencil.interp_u_center(U)
        Vi = stencil.interp_v_center(V)
        rec = plic.elvira(vf, g.dx, g.dy)
        return adv.advect(vf, rec, U, V, Ui, Vi, g, dt)

    t = 0.0
    while t < t_end - 1e-14:
        U, V = _velocity(g, t, scale)
        # convective-only CFL (test/TaylorGreenVortexVOF.cpp uses
        # adjust_dt_convective_only with CFL 0.5, DT_MAX 1e-2)
        u_max = max(float(jnp.max(jnp.abs(U))) / g.dx, float(jnp.max(jnp.abs(V))) / g.dy)
        dt = min(0.5 / u_max, 1e-2, t_end - t)
        vf, vol_err = one(vf, U, V, dt)
        t += dt

        assert float(vol_err) < 1e-12 * max(scale * scale, 1.0), float(vol_err)
        vmin = float(jnp.min(vf))
        vmax = float(jnp.max(vf))
        assert abs(vmin) <= 1e-8, vmin
        assert abs(vmax - 1.0) <= 1e-8, vmax
        integral = float(jnp.sum(vf)) * g.dx * g.dy
        assert abs(integral - init_int) <= 1e-10 * max(scale * scale, 1.0), (
            integral - init_int
        )
