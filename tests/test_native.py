"""Native C++ host kernels vs the pure-Python reference implementations."""

import numpy as np
import pytest

from fluidsolver_tpu import native
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ib import luchini, sharp
from fluidsolver_tpu.ib.geometry import Circle


@pytest.fixture(scope="module")
def setup():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    g = make_grid(0.0, 3.0, 96, 0.0, 1.0, 32)
    wall = Circle(1.0, 0.5, 0.15)
    return g, wall


def test_luchini_native_matches_python(setup):
    g, wall = setup
    got = native.luchini_correction_circle(g.x, g.ym, g.dx, g.dy, wall.x, wall.y, wall.r)
    expected = luchini._correction_field(wall, g.x, g.ym, g.dx, g.dy)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-9)


def test_sharp_native_matches_python(setup):
    g, wall = setup
    for scheme in ["linear", "quadratic"]:
        nat = sharp._native_stencil(wall, g.xm, g.y, g.dx, g.dy, scheme)
        py = sharp._build_stencil(wall, g.xm, g.y, g.dx, g.dy, scheme)
        assert nat is not None
        # same node sets (order may differ -> sort by target)
        order_n = np.argsort(np.asarray(nat.tgt))
        order_p = np.argsort(np.asarray(py.tgt))
        np.testing.assert_array_equal(
            np.asarray(nat.tgt)[order_n], np.asarray(py.tgt)[order_p]
        )
        np.testing.assert_array_equal(
            np.asarray(nat.nb1)[order_n], np.asarray(py.nb1)[order_p]
        )
        np.testing.assert_allclose(
            np.asarray(nat.w1)[order_n], np.asarray(py.w1)[order_p], rtol=1e-10
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(nat.deep)), np.sort(np.asarray(py.deep))
        )
