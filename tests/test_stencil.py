"""Unit tests for the stencil operator layer.

Mirrors the reference's operator unit tests: interpolation exact for linear
fields, gradients exact for quadratics (test/Operators.cpp:68-140).
"""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import stencil


def _grid():
    return make_grid(0.0, 2.0, 12, -1.0, 1.0, 8)


def test_grid_coordinates():
    g = _grid()
    assert np.isclose(g.dx, 2.0 / 12)
    assert np.isclose(g.dy, 2.0 / 8)
    # face coords: x[1] == x_min (logical i=0)
    assert np.isclose(g.x[1], 0.0)
    assert np.isclose(g.x[-2], 2.0)
    # centers midway between faces
    assert np.allclose(g.xm, 0.5 * (g.x[:-1] + g.x[1:]))
    assert g.x.shape == (g.nx + 3,)
    assert g.xm.shape == (g.nx + 2,)


def test_interpolation_exact_for_linear():
    g = _grid()
    X, Y = np.meshgrid(g.x, g.ym, indexing="ij")
    U = jnp.asarray(2.0 * X - 3.0 * Y + 1.0)
    Ui = stencil.interp_u_center(U)
    Xc, Yc = np.meshgrid(g.xm, g.ym, indexing="ij")
    assert np.allclose(np.asarray(Ui), 2.0 * Xc - 3.0 * Yc + 1.0, atol=1e-14)

    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    V = jnp.asarray(-1.5 * Xv + 0.5 * Yv)
    Vi = stencil.interp_v_center(V)
    assert np.allclose(np.asarray(Vi), -1.5 * Xc + 0.5 * Yc, atol=1e-14)


def test_divergence_exact_for_linear():
    g = _grid()
    X, Y = np.meshgrid(g.x, g.ym, indexing="ij")
    U = jnp.asarray(3.0 * X + Y)
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    V = jnp.asarray(Xv - 2.0 * Yv)
    div = stencil.divergence(U, V, g.dx, g.dy)
    assert np.allclose(np.asarray(div), 1.0, atol=1e-12)


def test_grad_centered_exact_for_quadratic():
    g = _grid()
    X, Y = np.meshgrid(g.xm, g.ym, indexing="ij")
    f = jnp.asarray(X**2 + 3.0 * X * Y - 2.0 * Y**2 + X - Y + 0.5)
    dfdx, dfdy = stencil.grad_centered(f, g.dx, g.dy)
    # one-sided 2nd-order edges are exact for quadratics too
    assert np.allclose(np.asarray(dfdx), 2.0 * X + 3.0 * Y + 1.0, atol=1e-11)
    assert np.allclose(np.asarray(dfdy), 3.0 * X - 4.0 * Y - 1.0, atol=1e-11)


def test_integrate_and_shift():
    g = _grid()
    f = jnp.ones(g.shape_center)
    # interior integral = domain volume
    assert np.isclose(float(stencil.integrate(f, g.dx, g.dy)), 4.0)
    shifted = stencil.shift_pressure_to_zero(f, g.dx, g.dy)
    # reference subtracts the ghost-inclusive volume integral
    total = float(jnp.sum(f)) * g.dx * g.dy
    assert np.allclose(np.asarray(shifted), 1.0 - total, atol=1e-13)


def test_sample_centered_bilinear_exact_and_clamped():
    g = _grid()
    X, Y = np.meshgrid(g.xm, g.ym, indexing="ij")
    f = jnp.asarray(2.0 * X - Y + 0.25)
    px = jnp.asarray([0.37, 1.73, 0.0])
    py = jnp.asarray([-0.42, 0.11, -1.0])
    vals = stencil.sample_centered(f, g.xm[1], g.dx, g.ym[1], g.dy, px, py)
    expected = 2.0 * np.asarray(px) - np.asarray(py) + 0.25
    # interior points: bilinear is exact for linear fields
    assert np.allclose(np.asarray(vals)[:2], expected[:2], atol=1e-13)

    # far outside: clamps to the nearest interior cell value
    far = stencil.sample_centered(f, g.xm[1], g.dx, g.ym[1], g.dy,
                                  jnp.asarray([-10.0]), jnp.asarray([-10.0]))
    assert np.isclose(float(far[0]), float(f[1, 1]))


def test_mid_time_and_interp_uv():
    g = _grid()
    a = jnp.full(g.shape_center, 3.0)
    b = jnp.full(g.shape_center, 1.0)
    assert np.allclose(np.asarray(stencil.mid_time(a, b)), 2.0)

    ru = jnp.full(g.shape_u, 2.0)
    rv = jnp.full(g.shape_v, 4.0)
    c = stencil.interp_uv_center(ru, rv)
    assert c.shape == g.shape_center
    assert np.allclose(np.asarray(c), 3.0)


def test_sample_centered_stack_lattice_bit_exact():
    """The gather-free lattice sampler (dense RK4 backtrace path) is
    BIT-identical to the gather form for CFL-bounded displacements of the
    interior corner lattice — including points exactly on lattice corners
    and displacements that clamp at the domain edge."""
    rng = np.random.default_rng(7)
    for nx, ny, dtype in [(16, 12, np.float64), (33, 7, np.float32),
                          (5, 5, np.float64)]:
        dx, dy = 1.0 / nx, 1.3 / ny
        x0, y0 = 0.5 * dx, 0.5 * dy
        fields = jnp.asarray(rng.standard_normal((2, nx + 2, ny + 2)), dtype)
        I, J = np.meshgrid(np.arange(nx + 1), np.arange(ny + 1),
                           indexing="ij")
        cornx = x0 + (I - 0.5) * dx
        corny = y0 + (J - 0.5) * dy
        for scale in (0.9, 0.0):  # max CFL displacement / exactly on lattice
            px = jnp.asarray(
                cornx + rng.uniform(-scale, scale or 1e-300, I.shape) * dx,
                dtype)
            py = jnp.asarray(
                corny + rng.uniform(-scale, scale or 1e-300, I.shape) * dy,
                dtype)
            ref = stencil.sample_centered_stack(
                fields, x0, dx, y0, dy, px, py)
            new = stencil.sample_centered_stack_lattice(
                fields, x0, dx, y0, dy, px, py)
            assert np.array_equal(np.asarray(ref), np.asarray(new)), (
                nx, ny, dtype, scale)
