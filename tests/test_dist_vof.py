"""Sharded sparse VOF advection == the single-device sparse path.

8 virtual CPU devices (conftest). Differences vs single-device are float
noise only (the shard-shifted sampler origin can flip a cell-boundary
floor() by 1 ulp); f64 agreement is asserted at 1e-12.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.parallel import dist_vof
from fluidsolver_tpu.vof import advect as adv
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("x",))


def _case(nx, ny, flow="tgv"):
    g = make_grid(0.0, 1.0, nx, 0.0, 1.0, ny)
    vf = jnp.asarray(liquid_fraction_from_indicator(
        lambda x, y: (x - 0.55) ** 2 + (y - 0.4) ** 2 <= 0.2**2, g))
    if flow == "tgv":
        Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
        Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
        U = jnp.asarray(np.sin(np.pi * Xu) * np.cos(np.pi * Yu))
        V = jnp.asarray(-np.cos(np.pi * Xv) * np.sin(np.pi * Yv))
    else:
        U = jnp.full(g.shape_u, 1.0)
        V = jnp.full(g.shape_v, 0.5)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    rec = plic.elvira(vf, g.dx, g.dy)
    return g, vf, rec, U, V, Ui, Vi


@pytest.mark.parametrize("nx,ny,flow", [(64, 64, "tgv"), (48, 40, "const")])
def test_sharded_matches_single_device(nx, ny, flow):
    mesh = _mesh()
    g, vf, rec, U, V, Ui, Vi = _case(nx, ny, flow)
    dt = 0.4 * g.dx  # CFL ~0.4 at |u|<=1
    m = adv.default_max_active(nx, ny)

    ref, err_ref = adv.advect(vf, rec, U, V, Ui, Vi, g, dt, max_active=m)

    fn = jax.jit(lambda *a: dist_vof.advect_sharded(
        mesh, *a, grid=g, dt=dt, m_total=m))
    got, err = fn(vf, rec, U, V, Ui, Vi)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.0, atol=1e-12)
    np.testing.assert_allclose(float(err), float(err_ref),
                               rtol=1e-8, atol=1e-14)


def test_sharded_conservation():
    """Mass conservation + bounds through repeated sharded advections
    (test/ConstantVelocityVOF.cpp invariants)."""
    mesh = _mesh()
    g, vf, rec, U, V, Ui, Vi = _case(64, 64, "const")
    dt = 0.4 * g.dx
    m = adv.default_max_active(64, 64)

    @jax.jit
    def one(vf):
        rec = plic.elvira(vf, g.dx, g.dy)
        return dist_vof.advect_sharded(mesh, vf, rec, U, V, Ui, Vi,
                                       grid=g, dt=dt, m_total=m)

    m0 = float(jnp.sum(vf)) * g.dx * g.dy
    for _ in range(5):
        vf, err = one(vf)
        assert float(err) < 1e-12
    assert abs(float(jnp.sum(vf)) * g.dx * g.dy - m0) < 1e-12
    assert float(vf.min()) >= -1e-12 and float(vf.max()) <= 1 + 1e-12


def test_sharded_overflow_is_loud():
    mesh = _mesh()
    g, vf, rec, U, V, Ui, Vi = _case(64, 64, "const")
    _, err = jax.jit(lambda *a: dist_vof.advect_sharded(
        mesh, *a, grid=g, dt=0.4 * g.dx, m_total=16))(vf, rec, U, V, Ui, Vi)
    assert np.isinf(float(err))
