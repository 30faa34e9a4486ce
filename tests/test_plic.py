"""PLIC geometry property tests: forward/inverse consistency, ELVIRA
exactness for linear interfaces, segment extraction."""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.vof import plic

RNG = np.random.default_rng(11)


def test_area_fraction_known_cases():
    # vertical line through the middle: n=(1,0), d=w/2 -> half
    assert np.isclose(float(plic.area_fraction(1.0, 0.0, 0.5, 1.0, 1.0)), 0.5)
    # horizontal line: n=(0,1), d=0.25h
    assert np.isclose(float(plic.area_fraction(0.0, 1.0, 0.25, 1.0, 1.0)), 0.25)
    # diagonal through corners: n=(1,1)/sqrt2, d = sqrt2/2 -> half
    s = 1.0 / np.sqrt(2.0)
    assert np.isclose(float(plic.area_fraction(s, s, np.sqrt(2) / 2, 1.0, 1.0)), 0.5)
    # corner triangle: n=(1,1)/sqrt2, d = s*0.5 -> area 0.5*0.5*0.5/ (1*1)
    assert np.isclose(float(plic.area_fraction(s, s, s * 0.5, 1.0, 1.0)), 0.125)
    # everything / nothing
    assert np.isclose(float(plic.area_fraction(s, s, 10.0, 1.0, 1.0)), 1.0)
    assert np.isclose(float(plic.area_fraction(s, s, -10.0, 1.0, 1.0)), 0.0)
    # negative normal: liquid on the other side
    assert np.isclose(float(plic.area_fraction(-1.0, 0.0, -0.25, 1.0, 1.0)), 0.75)


def test_forward_inverse_roundtrip():
    n = 4000
    theta = RNG.uniform(0, 2 * np.pi, n)
    nx, ny = np.cos(theta), np.sin(theta)
    # include near-axis-aligned normals
    nx[:50] = 1.0; ny[:50] = 1e-14
    nx[50:100] = 1e-14; ny[50:100] = -1.0
    norm = np.hypot(nx, ny); nx /= norm; ny /= norm
    frac = RNG.uniform(0, 1, n)
    frac[:20] = 0.0
    frac[20:40] = 1.0
    w, h = 0.01, 0.025  # non-square, small cells like a real grid
    d = plic.plane_constant(jnp.asarray(nx), jnp.asarray(ny), jnp.asarray(frac), w, h)
    back = plic.area_fraction(jnp.asarray(nx), jnp.asarray(ny), d, w, h)
    np.testing.assert_allclose(np.asarray(back), frac, atol=1e-12)


def test_elvira_exact_for_linear_interface():
    # a straight interface: ELVIRA must reproduce the exact line
    g = make_grid(0.0, 1.0, 16, 0.0, 1.0, 16)
    # liquid below the line y = 0.3 + 0.4x  -> n ~ (-0.4, 1)/norm
    a, b = 0.4, 0.3
    nrm = np.hypot(a, 1.0)
    n_exact = np.array([-a / nrm, 1.0 / nrm])

    # exact cell fractions via the area formula itself (local coords)
    X0, Y0 = np.meshgrid(g.x[:-1], g.y[:-1], indexing="ij")  # lower-left corners
    # line in local coords of each cell: n.(p - p0) <= d_loc
    d_global = n_exact[1] * b  # n.x = d for points on y=a x + b: -a/nrm x + 1/nrm (a x + b)
    d_loc = d_global - (n_exact[0] * X0 + n_exact[1] * Y0)
    vf = np.asarray(plic.area_fraction(n_exact[0], n_exact[1], jnp.asarray(d_loc), g.dx, g.dy))

    rec = plic.elvira(jnp.asarray(vf), g.dx, g.dy)
    valid = np.asarray(rec.valid)
    assert valid.sum() > 10
    # reconstructed normals match the exact line normal on mixed cells
    np.testing.assert_allclose(np.asarray(rec.nx)[valid], n_exact[0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(rec.ny)[valid], n_exact[1], atol=1e-9)
    # reconstructed plane reproduces the exact vf
    back = np.asarray(plic.area_fraction(rec.nx, rec.ny, rec.d, g.dx, g.dy))
    np.testing.assert_allclose(back[valid], vf[valid], atol=1e-12)


def test_elvira_circle_normals():
    # normals of a circular interface should point radially outward of liquid
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    vf = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.25**2, g
    )
    rec = plic.elvira(jnp.asarray(vf), g.dx, g.dy)
    valid = np.asarray(rec.valid)
    assert valid.sum() > 50
    Xc, Yc = np.meshgrid(g.xm, g.ym, indexing="ij")
    rad_x = (Xc - 0.5)[valid]
    rad_y = (Yc - 0.5)[valid]
    rad = np.hypot(rad_x, rad_y)
    dot = (np.asarray(rec.nx)[valid] * rad_x + np.asarray(rec.ny)[valid] * rad_y) / rad
    # outward normal ~ radial direction; allow discretization wiggle
    assert np.min(dot) > 0.95, float(np.min(dot))


def test_segment_endpoints_simple():
    # vertical interface x = 0.3 in a unit cell
    p = plic.Plic(
        nx=jnp.asarray(1.0), ny=jnp.asarray(0.0), d=jnp.asarray(0.3),
        valid=jnp.asarray(True),
    )
    p0, p1 = plic.segment_endpoints(p, 1.0, 1.0)
    pts = sorted([tuple(np.asarray(p0)), tuple(np.asarray(p1))])
    np.testing.assert_allclose(pts[0], [0.3, 0.0], atol=1e-12)
    np.testing.assert_allclose(pts[1], [0.3, 1.0], atol=1e-12)
    length = plic.interface_length(p, 1.0, 1.0)
    assert np.isclose(float(length), 1.0)


def test_interface_length_circle():
    # total interface length of a circle ~ its circumference
    g = make_grid(0.0, 1.0, 128, 0.0, 1.0, 128)
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    r = 0.25
    vf = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= r**2, g
    )
    rec = plic.elvira(jnp.asarray(vf), g.dx, g.dy)
    total = float(jnp.sum(plic.interface_length(rec, g.dx, g.dy)))
    assert abs(total - 2 * np.pi * r) / (2 * np.pi * r) < 0.01, total


def test_sparse_elvira_matches_dense():
    """Mixed-cells-only ELVIRA (the default) must agree with the dense
    all-cells search on every valid cell, and flag lane overflow."""
    import numpy as np

    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    g = make_grid(0.0, 1.0, 96, 0.0, 1.0, 96)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.45) ** 2 + (y - 0.55) ** 2 <= 0.22**2, g
        )
    )
    rec_d = plic.elvira(vf, g.dx, g.dy, max_mixed=0)
    rec_s = plic.elvira(vf, g.dx, g.dy)
    assert bool(jnp.all(rec_d.valid == rec_s.valid))
    for name in ("nx", "ny", "d"):
        a = getattr(rec_d, name)
        b = getattr(rec_s, name)
        assert float(jnp.max(jnp.abs(jnp.where(rec_d.valid, a - b, 0.0)))) == 0.0
    assert not bool(rec_s.overflow)
    assert bool(plic.elvira(vf, g.dx, g.dy, max_mixed=4).overflow)
