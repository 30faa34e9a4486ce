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
import numpy as np

from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.vof.plic import (
    Plic,
    _NEIGHBOR_OFFSETS,
    _shift,
    clamp_lanes,
    default_max_mixed,
    segment_endpoints,
    segment_endpoints_vals,
)


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


def _vm_core(nb, t_nx, t_ny, dx, dy, dtype):
    """Volume-matching fit on a 3x3 neighborhood representation.

    ``nb[(di, dj)]`` = (seg_x0, seg_y0, seg_x1, seg_y1, valid) arrays of a
    common batch shape (dense: shifted interior views; sparse: gathered
    lanes). Returns the curvature of the (0, 0) cell, already masked."""
    t_x0, t_y0, t_x1, t_y1, t_valid = nb[(0, 0)]

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
        xs0, ys0, xs1, ys1, m = nb[(di, dj)]
        xs0 = xs0 + di * dx - cx
        ys0 = ys0 + dj * dy - cy
        xs1 = xs1 + di * dx - cx
        ys1 = ys1 + dj * dy - cy
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
    return jnp.where(t_valid & (count > 1), curv, 0.0)


def curvature_quad_volume_matching(
    vf_old: jnp.ndarray, rec: Plic, grid: Grid, max_mixed=None
) -> jnp.ndarray:
    """Curvature on the full ghost box (interior mixed cells; 0 elsewhere).

    ``max_mixed``: lane budget of the sparse mixed-cells-only path (None =
    auto, 0 = dense all-cells; same convention as plic.elvira). The two are
    bit-identical — curvature is zero off the mixed set by construction."""
    from fluidsolver_tpu.flags import pallas_enabled

    if pallas_enabled("FS_PALLAS_VOF"):
        from fluidsolver_tpu.vof import pallas_curvature as pc

        if pc.available(vf_old.shape, vf_old.dtype):
            # one banded HBM pass over the PLIC fields instead of the
            # sparse path's nonzero + gathers (see pallas_curvature)
            return pc.curvature_vm_pallas(
                rec.nx, rec.ny, rec.d, rec.valid, dx=grid.dx, dy=grid.dy)
    if max_mixed is None:
        max_mixed = default_max_mixed(vf_old.shape[0] - 2, vf_old.shape[1] - 2)
    if max_mixed:
        return _curvature_vm_sparse(vf_old, rec, grid, int(max_mixed))
    return _curvature_vm_dense(vf_old, rec, grid)


def _curvature_vm_dense(vf_old: jnp.ndarray, rec: Plic, grid: Grid) -> jnp.ndarray:
    dx, dy = grid.dx, grid.dy

    # segments in cell-local coords for every cell (garbage where invalid)
    p0, p1 = segment_endpoints(rec, dx, dy)
    seg_x0 = p0[..., 0]
    seg_y0 = p0[..., 1]
    seg_x1 = p1[..., 0]
    seg_y1 = p1[..., 1]

    # interior mixed neighbors only (is_valid_interior_index check,
    # src/Curvature.hpp:236-240): rec.valid is already False on ghosts
    nb = {
        (di, dj): (
            _shift(seg_x0, di, dj), _shift(seg_y0, di, dj),
            _shift(seg_x1, di, dj), _shift(seg_y1, di, dj),
            _shift(rec.valid, di, dj),
        )
        for di, dj in _NEIGHBOR_OFFSETS
    }
    curv = _vm_core(nb, _shift(rec.nx, 0, 0), _shift(rec.ny, 0, 0), dx, dy, vf_old.dtype)
    return jnp.pad(curv, ((1, 1), (1, 1))).astype(vf_old.dtype)


def _curvature_vm_sparse(vf_old: jnp.ndarray, rec: Plic, grid: Grid, m: int) -> jnp.ndarray:
    """Mixed-cells-only volume-matching fit: gather each mixed cell's 3x3
    PLIC neighborhood into ``m`` lanes, fit there, scatter back (curvature is
    identically zero off the mixed set). Lane overflow is already flagged by
    the reconstruction (Plic.overflow uses the same sizing rule)."""
    dx, dy = grid.dx, grid.dy
    nxc, nyc = vf_old.shape[0] - 2, vf_old.shape[1] - 2
    if rec.lane_i is not None and rec.lane_i.shape[0] == m:
        # the reconstruction already gathered exactly this mixed set — reuse
        # its lane indices instead of paying a second nonzero pass
        ii, jj = rec.lane_i, rec.lane_j
    else:
        mixed_int = rec.valid[1:-1, 1:-1]
        from fluidsolver_tpu.vof.plic import compact_indices

        ii, jj = compact_indices(mixed_int, m, nxc * nyc)
    iig, jjg = clamp_lanes(ii, jj, nxc, nyc)

    # one batched gather for all 4 fields x 9 neighborhoods (36 separate
    # gathers = 36 unfusable XLA kernels)
    dt_ = vf_old.dtype
    offs_i = jnp.asarray([di for di, _ in _NEIGHBOR_OFFSETS], jnp.int32)
    offs_j = jnp.asarray([dj for _, dj in _NEIGHBOR_OFFSETS], jnp.int32)
    II = 1 + offs_i[:, None] + iig[None, :]
    JJ = 1 + offs_j[:, None] + jjg[None, :]
    stacked = jnp.stack([rec.nx, rec.ny, rec.d, rec.valid.astype(dt_)])
    gathered = stacked[:, II, JJ]  # (4, 9, m)
    nb = {}
    for k, (di, dj) in enumerate(_NEIGHBOR_OFFSETS):
        pnx, pny, pd = gathered[0, k], gathered[1, k], gathered[2, k]
        p0, p1 = segment_endpoints_vals(pnx, pny, pd, dx, dy)
        nb[(di, dj)] = (
            p0[..., 0], p0[..., 1], p1[..., 0], p1[..., 1],
            gathered[3, k] > 0.5,
        )
    center = _NEIGHBOR_OFFSETS.index((0, 0))
    t_nx = gathered[0, center]
    t_ny = gathered[1, center]
    curv = _vm_core(nb, t_nx, t_ny, dx, dy, vf_old.dtype)
    return jnp.zeros_like(vf_old).at[1 + ii, 1 + jj].set(curv, mode="drop")


def curvature_quad_regression(vf_old: jnp.ndarray, rec: Plic, grid: Grid) -> jnp.ndarray:
    """Least-squares quadratic through the rotated segment midpoints
    (src/Curvature.hpp:272-316)."""
    dx, dy = grid.dx, grid.dy
    dtype = vf_old.dtype

    p0, p1 = segment_endpoints(rec, dx, dy)
    seg_x0, seg_y0 = p0[..., 0], p0[..., 1]
    seg_x1, seg_y1 = p1[..., 0], p1[..., 1]

    t_nx = _shift(rec.nx, 0, 0)
    t_ny = _shift(rec.ny, 0, 0)
    t_valid = _shift(rec.valid, 0, 0)
    angle = jnp.arccos(jnp.clip(-t_ny, -1.0, 1.0))
    angle = jnp.where(t_nx > 0.0, 2.0 * jnp.pi - angle, angle)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    cx = 0.5 * (_shift(seg_x0, 0, 0) + _shift(seg_x1, 0, 0))
    cy = 0.5 * (_shift(seg_y0, 0, 0) + _shift(seg_y1, 0, 0))

    A = jnp.zeros((*cx.shape, 3, 3), dtype)
    bvec = jnp.zeros((*cx.shape, 3), dtype)
    x_eval = None
    for di, dj in _NEIGHBOR_OFFSETS:
        mx = 0.5 * (_shift(seg_x0, di, dj) + _shift(seg_x1, di, dj)) + di * dx - cx
        my = 0.5 * (_shift(seg_y0, di, dj) + _shift(seg_y1, di, dj)) + dj * dy - cy
        rx = ca * mx - sa * my
        ry = sa * mx + ca * my
        m = t_valid if (di == 0 and dj == 0) else _shift(rec.valid, di, dj)
        rx = jnp.where(m, rx, 0.0)
        ry = jnp.where(m, ry, 0.0)
        if di == 0 and dj == 0:
            x_eval = rx
        w = m.astype(dtype)
        P = jnp.stack([jnp.ones_like(rx), rx, rx * rx], axis=-1)
        A = A + w[..., None, None] * P[..., :, None] * P[..., None, :]
        bvec = bvec + w[..., None] * P * ry[..., None]

    c0, c1, c2 = _solve3_cramer(A, bvec)
    first = c1 + 2.0 * c2 * x_eval
    curv = 2.0 * c2 / jnp.power(1.0 + first * first, 1.5)
    curv = jnp.where(jnp.isfinite(curv), curv, 0.0)
    curv = jnp.where(t_valid, curv, 0.0)
    return jnp.pad(curv, ((1, 1), (1, 1))).astype(vf_old.dtype)


def curvature_convolved_vf(
    vf_old: jnp.ndarray, rec: Plic, grid: Grid, interpolate: bool = True
) -> jnp.ndarray:
    """Convolved-vf curvature (Cummins/Francois/Kothe 2005;
    src/Curvature.hpp:319-369): smooth vf with a compact polynomial kernel
    (4-cell support, src/Curvature.hpp:20-53), then
    kappa = -div(grad/|grad|), optionally sampled at the interface midpoint."""
    from jax import lax

    from fluidsolver_tpu.ops.stencil import grad_centered, sample_centered

    dx, dy = grid.dx, grid.dy
    dtype = vf_old.dtype
    n_smooth = 4
    length = n_smooth * max(dx, dy)

    # convolution kernel w(r) = (1 - (r/L)^2)^4 on a (2n+1)^2 stencil
    offs = np.arange(-n_smooth, n_smooth + 1)
    KX, KY = np.meshgrid(offs * dx, offs * dy, indexing="ij")
    q = (KX**2 + KY**2) / length**2
    ker = np.where(q < 1.0, (1.0 - q) ** 4, 0.0)
    kerj = jnp.asarray(ker, dtype)

    # interior-only accumulation with out-of-range neighbors skipped
    # (is_valid_index gating, src/Curvature.hpp:43-49): zero-pad interior
    interior = vf_old[1:-1, 1:-1]
    smooth = lax.conv_general_dilated(
        interior[None, None], kerj[None, None],
        window_strides=(1, 1), padding="SAME",
    )[0, 0]
    vf_smooth = jnp.pad(smooth, ((1, 1), (1, 1))).astype(vf_old.dtype)

    dvfdx, dvfdy = grad_centered(vf_smooth, dx, dy)
    dxx, dxy = grad_centered(dvfdx, dx, dy)
    _, dyy = grad_centered(dvfdy, dx, dy)

    numer = dxx * dvfdy**2 + dyy * dvfdx**2 - 2.0 * dvfdx * dvfdy * dxy
    denom = jnp.power(dvfdx**2 + dvfdy**2, 1.5)
    curv_c = jnp.where(jnp.abs(denom) > 1e-8, -numer / jnp.where(denom == 0.0, 1.0, denom), 0.0)

    valid = rec.valid
    if not interpolate:
        return jnp.where(valid, curv_c, 0.0)

    # sample at the interface midpoint (global coords)
    p0, p1 = segment_endpoints(rec, dx, dy)
    X0 = jnp.asarray(grid.x[:-1], dtype)[:, None]
    Y0 = jnp.asarray(grid.y[:-1], dtype)[None, :]
    mx = 0.5 * (p0[..., 0] + p1[..., 0]) + X0
    my = 0.5 * (p0[..., 1] + p1[..., 1]) + Y0
    sampled = sample_centered(curv_c, grid.xm[1], dx, grid.ym[1], dy, mx, my)
    return jnp.where(valid, sampled, 0.0)
