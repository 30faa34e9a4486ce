"""Curvature estimator accuracy: circles have kappa = 1/R, lines kappa = 0.

Uses exact circle-cell fractions (tests/geom_util.py) — the Gauss-16
indicator quadrature used for case init has a ~1e-3 fraction-noise floor
that would mask the fit's convergence order.
"""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.curvature import curvature_quad_volume_matching
from geom_util import circle_cell_fractions


def _circle_curv(n, r=0.25):
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    vf = jnp.asarray(circle_cell_fractions(g, 0.5, 0.5, r))
    rec = plic.elvira(vf, g.dx, g.dy)
    curv = curvature_quad_volume_matching(vf, rec, g)
    valid = np.asarray(rec.valid)
    return np.asarray(curv)[valid], g


def test_circle_curvature_value_and_sign():
    vals, g = _circle_curv(64)
    # liquid drop with outward normals: kappa = +1/R = +4
    assert vals.size > 50
    rel_err = np.abs(vals - 4.0) / 4.0
    assert np.median(rel_err) < 5e-3, float(np.median(rel_err))
    assert np.max(rel_err) < 2e-2, float(np.max(rel_err))


def test_circle_curvature_convergence():
    e64 = np.median(np.abs(_circle_curv(64)[0] - 4.0))
    e128 = np.median(np.abs(_circle_curv(128)[0] - 4.0))
    # ~2nd-order convergence of the volume-matching paraboloid fit
    assert e128 < 0.4 * e64, (e64, e128)


def test_line_interface_zero_curvature():
    g = make_grid(0.0, 1.0, 32, 0.0, 1.0, 32)
    a, b = 0.37, 0.21
    nrm = np.hypot(a, 1.0)
    n_exact = np.array([-a / nrm, 1.0 / nrm])
    X0, Y0 = np.meshgrid(g.x[:-1], g.y[:-1], indexing="ij")
    d_loc = n_exact[1] * b - (n_exact[0] * X0 + n_exact[1] * Y0)
    vf = plic.area_fraction(n_exact[0], n_exact[1], jnp.asarray(d_loc), g.dx, g.dy)
    rec = plic.elvira(vf, g.dx, g.dy)
    curv = curvature_quad_volume_matching(vf, rec, g)
    valid = np.asarray(rec.valid)
    assert valid.sum() > 10
    np.testing.assert_allclose(np.asarray(curv)[valid], 0.0, atol=1e-7)


def test_gas_bubble_negative_curvature():
    # inverted phase: gas bubble in liquid -> normals point inward ->
    # curvature should be -1/R
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    vf = jnp.asarray(1.0 - circle_cell_fractions(g, 0.5, 0.5, 0.25))
    rec = plic.elvira(vf, g.dx, g.dy)
    curv = curvature_quad_volume_matching(vf, rec, g)
    vals = np.asarray(curv)[np.asarray(rec.valid)]
    rel_err = np.abs(vals + 4.0) / 4.0
    assert np.median(rel_err) < 5e-3, float(np.median(rel_err))


def test_sparse_curvature_matches_dense():
    """Sparse mixed-cells volume-matching fit == dense path everywhere."""
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    g = make_grid(0.0, 1.0, 96, 0.0, 1.0, 96)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.45) ** 2 + (y - 0.55) ** 2 <= 0.22**2, g
        )
    )
    rec = plic.elvira(vf, g.dx, g.dy)
    c_d = curvature_quad_volume_matching(vf, rec, g, max_mixed=0)
    c_s = curvature_quad_volume_matching(vf, rec, g)
    assert float(jnp.max(jnp.abs(c_d - c_s))) == 0.0
