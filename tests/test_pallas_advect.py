"""Fused Pallas overlap kernel vs the XLA clip chain (interpret mode on
CPU; the real kernel runs on TPU, validated by tools/validate_vof_tpu.py).

The kernel reproduces the identical Sutherland-Hodgman emission order and
per-clip arithmetic (pallas_advect module doc); the only admissible
difference vs the XLA sparse path is float summation order in the shoelace
area and the 9-neighbor accumulation — a few ULP. Run in f64 (conftest x64)
where both paths agree to ~1e-14 rel, plus exact invariant checks
(conservation, bounds) through the full advection entry point."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.vof import advect as adv
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


@pytest.fixture
def force_interpret(monkeypatch):
    monkeypatch.setattr(adv, "_PALLAS_OVERRIDE", "interpret")


def _case(nx=64, ny=64, dtype=jnp.float64):
    g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.45) ** 2 + (y - 0.62) ** 2 <= 0.22**2, g
        ),
        dtype,
    )
    # smooth solenoidal velocity with nonzero discrete divergence noise:
    # U = sin(pi x) cos(pi y), V = -cos(pi x) sin(pi y)
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    U = jnp.asarray(np.sin(np.pi * Xu) * np.cos(np.pi * Yu), dtype)
    V = jnp.asarray(-np.cos(np.pi * Xv) * np.sin(np.pi * Yv), dtype)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    rec = plic.elvira(vf, g.dx, g.dy)
    return g, vf, rec, U, V, Ui, Vi


def _run(g, vf, rec, U, V, Ui, Vi, dt=4e-3, **kw):
    return adv.advect(vf, rec, U, V, Ui, Vi, g, dt, **kw)


def test_overlap_kernel_matches_xla_sparse(force_interpret, monkeypatch):
    g, vf, rec, U, V, Ui, Vi = _case()
    vf_pal, err_pal = _run(g, vf, rec, U, V, Ui, Vi)

    monkeypatch.setattr(adv, "_PALLAS_OVERRIDE", "off")
    vf_xla, err_xla = _run(g, vf, rec, U, V, Ui, Vi)

    np.testing.assert_allclose(np.asarray(vf_pal), np.asarray(vf_xla),
                               rtol=0.0, atol=1e-13)
    np.testing.assert_allclose(float(err_pal), float(err_xla),
                               rtol=1e-10, atol=1e-15)


def test_overlap_kernel_quad_variant(force_interpret, monkeypatch):
    g, vf, rec, U, V, Ui, Vi = _case(48, 40)
    vf_pal, _ = _run(g, vf, rec, U, V, Ui, Vi, no_correction=True)
    monkeypatch.setattr(adv, "_PALLAS_OVERRIDE", "off")
    vf_xla, _ = _run(g, vf, rec, U, V, Ui, Vi, no_correction=True)
    np.testing.assert_allclose(np.asarray(vf_pal), np.asarray(vf_xla),
                               rtol=0.0, atol=1e-13)


def test_overlap_kernel_invariants(force_interpret):
    """Conservation/bounds through the kernel path: constant-velocity
    translation (test/ConstantVelocityVOF.cpp:40-176 invariants)."""
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.3) ** 2 + (y - 0.3) ** 2 <= 0.125**2, g
        )
    )
    U = jnp.full(g.shape_u, 1.0)
    V = jnp.full(g.shape_v, 0.5)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    dt = 5e-3

    @jax.jit
    def one(vf):
        rec = plic.elvira(vf, g.dx, g.dy)
        return adv.advect(vf, rec, U, V, Ui, Vi, g, dt)

    init_int = float(jnp.sum(vf)) * g.dx * g.dy
    for _ in range(6):
        vf, vol_err = one(vf)
        assert float(vol_err) < 1e-12
        assert abs(float(jnp.min(vf))) <= 1e-12
        assert abs(float(jnp.max(vf)) - 1.0) <= 1e-12
        assert abs(float(jnp.sum(vf)) * g.dx * g.dy - init_int) <= 1e-12


def test_overlap_kernel_f32(force_interpret, monkeypatch):
    """f32 parity (the production TPU dtype): agreement to f32 rounding."""
    g, vf, rec, U, V, Ui, Vi = _case(dtype=jnp.float32)
    vf_pal, _ = _run(g, vf, rec, U, V, Ui, Vi)
    monkeypatch.setattr(adv, "_PALLAS_OVERRIDE", "off")
    vf_xla, _ = _run(g, vf, rec, U, V, Ui, Vi)
    np.testing.assert_allclose(np.asarray(vf_pal), np.asarray(vf_xla),
                               rtol=0.0, atol=5e-6)
