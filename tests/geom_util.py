"""Exact geometric cell fractions for tests (circle-rectangle overlap)."""

import numpy as np


def circle_cell_fractions(grid, cx, cy, r, n_gauss=500):
    """Cell-averaged fractions of a disk over the full ghost box, exact to
    ~1e-10 (1D Gauss integration of the chord-width function, which is
    smooth up to isolated kinks)."""
    pts, wts = np.polynomial.legendre.leggauss(n_gauss)
    x = grid.x - cx     # cell face coords relative to the circle center
    y = grid.y - cy
    X0 = x[:-1][:, None]
    X1 = x[1:][:, None]
    # Gauss nodes in each x-column: (ncells_x, n_gauss)
    U = 0.5 * (X1 - X0) * pts[None, :] + 0.5 * (X1 + X0)
    S = np.sqrt(np.maximum(r * r - U * U, 0.0))
    out = np.zeros((len(x) - 1, len(y) - 1))
    for j in range(len(y) - 1):
        y0, y1 = y[j], y[j + 1]
        width = np.clip(y1, -S, S) - np.clip(y0, -S, S)
        integral = 0.5 * (X1 - X0)[:, 0] * np.sum(width * wts[None, :], axis=1)
        out[:, j] = integral / ((X1 - X0)[:, 0] * (y1 - y0))
    return np.clip(out, 0.0, 1.0)
