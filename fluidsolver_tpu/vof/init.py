"""VOF field initialization by per-cell Gauss-Legendre quadrature.

Replaces the reference's quadrature-based indicator integration
(src/Quadrature.hpp:37-66 with the N=16 default table, used at
examples/TwoPhaseSolver.cpp:227-229). Runs host-side in numpy at setup; the
points/weights come from ``numpy.polynomial.legendre.leggauss`` instead of
the reference's 1,926-line constant table (src/QuadratureTables.hpp).
"""

from __future__ import annotations

import numpy as np

from fluidsolver_tpu.core.grid import Grid


def gauss_cell_average(f, x_lo, x_hi, y_lo, y_hi, n: int = 16):
    """Average of f over each cell [x_lo,x_hi] x [y_lo,y_hi] by an n x n
    tensor-product Gauss rule. Inputs are broadcastable arrays of cell
    bounds; ``f(x, y)`` must be numpy-vectorized."""
    pts, wts = np.polynomial.legendre.leggauss(n)
    x_lo = np.asarray(x_lo)[..., None, None]
    x_hi = np.asarray(x_hi)[..., None, None]
    y_lo = np.asarray(y_lo)[..., None, None]
    y_hi = np.asarray(y_hi)[..., None, None]
    xs = 0.5 * (x_hi - x_lo) * pts[:, None] + 0.5 * (x_hi + x_lo)
    ys = 0.5 * (y_hi - y_lo) * pts[None, :] + 0.5 * (y_hi + y_lo)
    vals = f(xs, ys)
    w2 = wts[:, None] * wts[None, :]
    integral = np.sum(vals * w2, axis=(-2, -1)) * 0.25 * (x_hi - x_lo)[..., 0, 0] * (
        y_hi - y_lo
    )[..., 0, 0]
    return integral / ((x_hi - x_lo) * (y_hi - y_lo))[..., 0, 0]


def liquid_fraction_from_indicator(indicator, grid: Grid, n: int = 16) -> np.ndarray:
    """Cell-averaged volume fractions over the FULL ghost box (the reference
    initializes ghost cells too, examples/TwoPhaseSolver.cpp:227)."""
    x = grid.x
    y = grid.y
    X_lo, Y_lo = np.meshgrid(x[:-1], y[:-1], indexing="ij")
    X_hi, Y_hi = np.meshgrid(x[1:], y[1:], indexing="ij")

    def f(xs, ys):
        return np.asarray(indicator(xs, ys), dtype=np.float64)

    return gauss_cell_average(f, X_lo, X_hi, Y_lo, Y_hi, n)
