"""Pallas fused RB smoother vs the XLA reference implementation
(interpret mode on CPU; the real kernel path is exercised on TPU)."""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import linsys, mg
from fluidsolver_tpu.poisson import pallas_smoother as ps


def test_pallas_sweep_matches_xla():
    g = make_grid(0.0, 1.0, 30, 0.0, 1.0, 22)
    rng = np.random.default_rng(5)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    level = mg.MGLevel(op=op, red=mg._checkerboard(op.aC.shape, op.aC.dtype))
    x = jnp.asarray(rng.normal(size=g.shape_center))
    b = jnp.asarray(rng.normal(size=g.shape_center))

    for reverse in [False, True]:
        ref = mg._rb_sweep(level, x, b, reverse=reverse)
        got = ps.rb_sweep_pallas(op, x, b, reverse=reverse, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12)


def test_fused_smooth_matches_sweeps():
    # temporally-blocked multi-half-step kernel == chained XLA color updates
    from fluidsolver_tpu.poisson import boxmg
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    rng = np.random.default_rng(11)
    for nx, ny in [(62, 62), (94, 40)]:
        g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
        rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
        rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
        op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
        level = boxmg.BoxLevel(
            op=op, red=boxmg._checkerboard(op.aC.shape, op.aC.dtype), tr=None
        )
        b = jnp.asarray(rng.normal(size=g.shape_center))
        x0 = jnp.asarray(rng.normal(size=g.shape_center))

        x_ref = jnp.zeros_like(b)
        for _ in range(2):
            x_ref = boxmg._rb_sweep(level, x_ref, b)
        r_ref = b - linsys.apply_op(op, x_ref)
        x, r = pv.fused_smooth(
            op, b, colors=(True, False, True, False), residual=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-12)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-12)

        x_ref = x0
        for _ in range(2):
            x_ref = boxmg._rb_sweep(level, x_ref, b, reverse=True)
        x = pv.fused_smooth(
            op, b, x0=x0, colors=(False, True, False, True), interpret=True
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-12)


def test_sweep_available_gating():
    # CPU backend -> unavailable; VMEM budget respected
    assert not ps.sweep_available((130, 130), jnp.float32, backend="cpu")
    assert ps.sweep_available((514, 514), jnp.float32, backend="tpu")
    assert not ps.sweep_available((4100, 4100), jnp.float32, backend="tpu")
