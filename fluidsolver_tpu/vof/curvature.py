"""Interface curvature from PLIC segments.

Vectorized re-design of the reference's three curvature estimators
(src/Curvature.hpp:17-369). The default solver path is the quadratic
volume-matching fit (Jibben/Carlson/Francois paraboloid-fit technique,
src/Curvature.hpp:219-269): collect the 3x3 neighborhood's PLIC segments,
rotate them so the target cell's normal points to (0,-1), fit y = c0 + c1 x
+ c2 x^2 by matching segment integrals in a least-squares sense, and
evaluate kappa = y''/(1+y'^2)^(3/2) at the target midpoint.

Everything is dense masked compute: per cell a fixed 9-segment gather
(shifted views), a closed-form 3x3 Cramer solve, and NaN/inf clamping to 0
exactly like the reference (src/Curvature.hpp:263).
"""

from __future__ import annotations

import jax.numpy as jnp

from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.vof.plic import Plic, _NEIGHBOR_OFFSETS, _shift, segment_endpoints


def _solve3_cramer(A, d):
    """Solve the symmetric 3x3 systems A c = d (leading batch dims).

    A: (..., 3, 3), d: (..., 3). Singular systems produce inf/NaN, which the
    caller clamps — same net behavior as the reference's Gaussian
    elimination followed by the NaN guard."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    e, f = A[..., 1, 1], A[..., 1, 2]
    i = A[..., 2, 2]
    # symmetric: [[a,b,c],[b,e,f],[c,f,i]]
    det = a * (e * i - f * f) - b * (b * i - f * c) + c * (b * f - e * c)
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    det0 = d0 * (e * i - f * f) - b * (d1 * i - f * d2) + c * (d1 * f - e * d2)
    det1 = a * (d1 * i - f * d2) - d0 * (b * i - f * c) + c * (b * d2 - d1 * c)
    det2 = a * (e * d2 - d1 * f) - b * (b * d2 - d1 * c) + d0 * (b * f - e * c)
    return det0 / det, det1 / det, det2 / det


def curvature_quad_volume_matching(vf_old: jnp.ndarray, rec: Plic, grid: Grid) -> jnp.ndarray:
    """Curvature on the full ghost box (interior mixed cells; 0 elsewhere)."""
    dx, dy = grid.dx, grid.dy
    dtype = vf_old.dtype

    # segments in cell-local coords for every cell (garbage where invalid)
    p0, p1 = segment_endpoints(rec, dx, dy)
    seg_x0 = p0[..., 0]
    seg_y0 = p0[..., 1]
    seg_x1 = p1[..., 0]
    seg_y1 = p1[..., 1]

    # target-cell interior views
    t_x0 = _shift(seg_x0, 0, 0)
    t_y0 = _shift(seg_y0, 0, 0)
    t_x1 = _shift(seg_x1, 0, 0)
    t_y1 = _shift(seg_y1, 0, 0)
    t_nx = _shift(rec.nx, 0, 0)
    t_ny = _shift(rec.ny, 0, 0)
    t_valid = _shift(rec.valid, 0, 0)

    # rotation taking the target normal to (0,-1)
    # (src/Curvature.hpp:89-124: angle = acos(-n_y), mirrored if n_x > 0)
    angle = jnp.arccos(jnp.clip(-t_ny, -1.0, 1.0))
    angle = jnp.where(t_nx > 0.0, 2.0 * jnp.pi - angle, angle)
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)

    # center of rotation: target segment midpoint (in target-local coords)
    cx = 0.5 * (t_x0 + t_x1)
    cy = 0.5 * (t_y0 + t_y1)

    def rotate_shifted(di, dj):
        """Neighbor segment endpoints shifted into the target frame and
        rotated about (cx, cy)."""
        xs0 = _shift(seg_x0, di, dj) + di * dx - cx
        ys0 = _shift(seg_y0, di, dj) + dj * dy - cy
        xs1 = _shift(seg_x1, di, dj) + di * dx - cx
        ys1 = _shift(seg_y1, di, dj) + dj * dy - cy
        rx0 = ca * xs0 - sa * ys0
        ry0 = sa * xs0 + ca * ys0
        rx1 = ca * xs1 - sa * ys1
        ry1 = sa * xs1 + ca * ys1
        # sort so begin.x <= end.x (src/Curvature.hpp:127-132)
        swap = rx0 > rx1
        bx = jnp.where(swap, rx1, rx0)
        by = jnp.where(swap, ry1, ry0)
        ex = jnp.where(swap, rx0, rx1)
        ey = jnp.where(swap, ry0, ry1)
        if di == 0 and dj == 0:
            m = t_valid
        else:
            # interior mixed neighbors only (is_valid_interior_index check,
            # src/Curvature.hpp:236-240): rec.valid is already False on ghosts
            m = _shift(rec.valid, di, dj)
        # masked-out cells can carry degenerate (zero-length) segments whose
        # slope is 0/0; replace them with a dummy unit segment so the weighted
        # accumulation below never sees NaN (0 * NaN != 0)
        bx = jnp.where(m, bx, 0.0)
        by = jnp.where(m, by, 0.0)
        ex = jnp.where(m, ex, 1.0)
        ey = jnp.where(m, ey, 0.0)
        return bx, by, ex, ey, m

    # accumulate the volume-matching normal equations over <=9 segments
    # (src/Curvature.hpp:143-189): S_r = [dx_r, (x1^2-x0^2)/2, (x1^3-x0^3)/3],
    # target value integrals from the segment's own line y = b0 + b1 x.
    A = jnp.zeros((*cx.shape, 3, 3), dtype)
    dvec = jnp.zeros((*cx.shape, 3), dtype)
    count = jnp.zeros(cx.shape, jnp.int32)

    for di, dj in _NEIGHBOR_OFFSETS:
        bx, by, ex, ey, m = rotate_shifted(di, dj)
        b1 = (ey - by) / (ex - bx)
        b0 = by - b1 * bx
        S0 = ex - bx
        S1 = 0.5 * (ex * ex - bx * bx)
        S2 = (ex * ex * ex - bx * bx * bx) / 3.0
        S = jnp.stack([S0, S1, S2], axis=-1)
        w = m.astype(dtype)
        A = A + w[..., None, None] * S[..., :, None] * S[..., None, :]
        rhs_r = b0 * S0 + b1 * S1
        dvec = dvec + w[..., None] * S * rhs_r[..., None]
        count = count + m.astype(jnp.int32)

    c0, c1, c2 = _solve3_cramer(A, dvec)

    # evaluate at the rotated target midpoint: the rotation is centered on
    # it, so x_eval = 0 exactly (src/Curvature.hpp:187)
    first = c1
    curv = 2.0 * c2 / jnp.power(1.0 + first * first, 1.5)

    curv = jnp.where(jnp.isfinite(curv), curv, 0.0)
    # single-segment cells get 0 (src/Curvature.hpp:243-246)
    curv = jnp.where(t_valid & (count > 1), curv, 0.0)

    out = jnp.zeros_like(vf_old)
    return out.at[1:-1, 1:-1].set(curv)
