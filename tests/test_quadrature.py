"""Quadrature unit tests (test/Quadrature.cpp:18-156 analog): known
integrals + convergence-rate envelopes."""

import numpy as np

from fluidsolver_tpu.utils import quadrature as q


def test_gauss_polynomial_exactness():
    # n-point Gauss is exact for degree 2n-1
    for n in [1, 2, 4, 8]:
        deg = 2 * n - 1
        got = q.gauss_legendre(lambda x: x**deg + 2.0 * x + 1.0, -1.0, 2.0, n)
        exact = (2.0 ** (deg + 1) - (-1.0) ** (deg + 1)) / (deg + 1) + (4 - 1) + 3
        assert abs(got - exact) < 1e-12 * max(1, abs(exact)), (n, got, exact)


def test_gauss_transcendental_convergence():
    f = lambda x: np.exp(x) * np.sin(3 * x)  # noqa: E731
    exact = (np.exp(2.0) * (np.sin(6.0) - 3 * np.cos(6.0)) + 3.0) / 10.0
    errs = [abs(q.gauss_legendre(f, 0.0, 2.0, n) - exact) for n in (4, 8, 16)]
    assert errs[1] < 1e-6 * errs[0] or errs[1] < 1e-12
    assert errs[2] < 1e-14


def test_gauss_2d():
    got = q.gauss_legendre_2d(lambda x, y: x * x * y + 1.0, 0.0, 1.0, 0.0, 2.0, 8)
    exact = (1.0 / 3.0) * 2.0 + 2.0
    assert abs(got - exact) < 1e-13


def test_composite_rules():
    f = lambda x: np.sin(x)  # noqa: E731
    exact = 1.0 - np.cos(2.0)
    xs = np.linspace(0.0, 2.0, 129)
    assert abs(q.simpsons_rule(f(xs), 0.0, 2.0) - exact) < 1e-8
    assert abs(q.trapezoidal_rule(f(xs), xs) - exact) < 1e-4
    xm = 0.5 * (xs[:-1] + xs[1:])
    assert abs(q.midpoint_rule(f(xm), xs[1] - xs[0]) - exact) < 1e-4

    # convergence orders: trapezoid/midpoint 2nd, simpson 4th
    xs2 = np.linspace(0.0, 2.0, 257)
    e1 = abs(q.trapezoidal_rule(f(xs), xs) - exact)
    e2 = abs(q.trapezoidal_rule(f(xs2), xs2) - exact)
    assert e2 < 0.3 * e1
    s1 = abs(q.simpsons_rule(f(xs), 0.0, 2.0) - exact)
    s2 = abs(q.simpsons_rule(f(xs2), 0.0, 2.0) - exact)
    assert s2 < 0.08 * s1


def test_invalid_inputs():
    import pytest

    with pytest.raises(ValueError):
        q.gauss_legendre(lambda x: x, 0, 1, 0)
    with pytest.raises(ValueError):
        q.gauss_legendre(lambda x: x, 0, 1, 65)
    with pytest.raises(ValueError):
        q.simpsons_rule(np.ones(4), 0.0, 1.0)  # even sample count
