"""Dense banded Pallas volume-matching curvature.

Companion to vof/pallas_elvira.py: the sparse curvature path's nonzero +
batched 3x3 gather + scatter lower to slow TPU gathers (and with the dense
Pallas ELVIRA active it also loses its lane-index reuse). This kernel
evaluates the identical quad volume-matching fit (curvature._vm_core,
reference src/Curvature.hpp:89-269) for EVERY cell in one banded HBM pass
over (nx, ny, d, valid) and masks to the mixed cells.

Math notes:
- segment_endpoints_vals is re-expressed with unrolled per-plane arrays
  (no trailing stacked axes — Mosaic layouts want 2D planes); identical
  formulas and pair selection order.
- the rotation taking the target normal to (0, -1) is built directly from
  the unit normal: cos(angle) = -ny, sin(angle) = +/- sqrt(1 - ny^2)
  (mirrored for nx > 0) — mathematically identical to the XLA path's
  acos/cos/sin roundtrip for unit normals, so values agree to rounding
  (not bitwise; the parity test uses tolerances).
- the symmetric 3x3 normal equations accumulate in 6 + 3 unrolled planes;
  Cramer's rule mirrors curvature._solve3_cramer with singular systems
  producing inf/NaN that the same isfinite clamp zeroes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fluidsolver_tpu.vof.plic import _NEIGHBOR_OFFSETS

VMEM_BUDGET_BYTES = 48 * 1024 * 1024
_N_ARRAYS = 44


def _pick_band(N, M_pad, itemsize):
    B = 512
    while B > 8:
        if B < N + 16 and (B + 16) * M_pad * _N_ARRAYS * itemsize < VMEM_BUDGET_BYTES:
            return B
        B //= 2
    return 8


def available(shape, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False  # f64 is emulated on TPU; Mosaic rejects it
    return shape[0] >= 32 and shape[1] >= 2


def _segment_endpoints_planes(pnx, pny, pd, w, h, eps_rel=1e-6):
    """plic.segment_endpoints_vals with unrolled plane outputs
    (x0, y0, x1, y1) — same formulas, same best-pair selection order."""
    corners = [(0.0, 0.0), (w, 0.0), (w, h), (0.0, h)]
    eps = eps_rel * max(w, h)
    big = 4.0 * (w + h)

    pts_x, pts_y, ok = [], [], []
    for k in range(4):
        x0, y0 = corners[k]
        x1, y1 = corners[(k + 1) % 4]
        d0 = pnx * x0 + pny * y0 - pd
        d1 = pnx * x1 + pny * y1 - pd
        denom = d0 - d1
        t = jnp.where(jnp.abs(denom) > 1e-300,
                      d0 / jnp.where(denom == 0.0, 1.0, denom), big)
        px = x0 + t * (x1 - x0)
        py = y0 + t * (y1 - y0)
        inb = (px >= -eps) & (px <= w + eps) & (py >= -eps) & (py <= h + eps)
        pts_x.append(px)
        pts_y.append(py)
        ok.append(inb)

    best = None
    for a in range(4):
        for b in range(a + 1, 4):
            d2 = (pts_x[a] - pts_x[b]) ** 2 + (pts_y[a] - pts_y[b]) ** 2
            d2 = jnp.where(ok[a] & ok[b], d2, -1.0)
            cand = (d2, pts_x[a], pts_y[a], pts_x[b], pts_y[b])
            if best is None:
                best = cand
            else:
                better = d2 > best[0]
                best = tuple(jnp.where(better, c, bc)
                             for c, bc in zip(cand, best))
    _, x0, y0, x1, y1 = best
    return x0, y0, x1, y1


@functools.partial(jax.jit, static_argnames=("dx", "dy", "interpret"))
def curvature_vm_pallas(rnx, rny, rd, valid, *, dx: float, dy: float,
                        interpret=False):
    """Curvature on the full ghost box (interior mixed cells; 0 elsewhere).
    ``valid`` may be bool or float; inputs are the Plic fields."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluidsolver_tpu.poisson.pallas_vcycle import _shift_in

    N, M = rnx.shape
    dtype = rnx.dtype
    validf = valid.astype(dtype)

    M_pad = -(-M // 128) * 128
    B = _pick_band(N, M_pad, jnp.dtype(dtype).itemsize)
    W = B + 16
    n_bands = -(-N // B)
    N_total = n_bands * B + 16

    def pad(a):
        return jnp.pad(a, ((8, N_total - 8 - a.shape[0]),
                           (0, M_pad - a.shape[1])))

    def kernel(nx_ref, ny_ref, d_ref, v_ref, o_curv, wins0, wins1, wins2,
               wins3, buf, sem_in, sem_out):
        band = pl.program_id(0)
        start = pl.multiple_of(band * B, 8)
        wins = [wins0, wins1, wins2, wins3]
        dmas = [pltpu.make_async_copy(r.at[pl.ds(start, W), :], wins[k],
                                      sem_in.at[k])
                for k, r in enumerate([nx_ref, ny_ref, d_ref, v_ref])]
        for c in dmas:
            c.start()
        for c in dmas:
            c.wait()
        pnx, pny, pd, pv = (w[:] for w in wins)
        sh = _shift_in

        # per-cell segment endpoints in the cell's own local frame
        sx0, sy0, sx1, sy1 = _segment_endpoints_planes(pnx, pny, pd, dx, dy)

        # target (center) quantities
        t_nx, t_ny = pnx, pny
        t_valid = pv > 0.5
        cx = 0.5 * (sx0 + sx1)
        cy = 0.5 * (sy0 + sy1)
        # rotation to (0, -1): ca = cos = -ny; sa = sin = +sqrt(1-ny^2),
        # mirrored (angle -> 2pi - angle => sin flips) when nx > 0
        ca = -t_ny
        sa = jnp.where(t_nx > 0.0, -1.0, 1.0) * jnp.sqrt(
            jnp.maximum(1.0 - t_ny * t_ny, 0.0))

        A00 = jnp.zeros((W, M_pad), dtype)
        A01 = jnp.zeros((W, M_pad), dtype)
        A02 = jnp.zeros((W, M_pad), dtype)
        A11 = jnp.zeros((W, M_pad), dtype)
        A12 = jnp.zeros((W, M_pad), dtype)
        A22 = jnp.zeros((W, M_pad), dtype)
        d0v = jnp.zeros((W, M_pad), dtype)
        d1v = jnp.zeros((W, M_pad), dtype)
        d2v = jnp.zeros((W, M_pad), dtype)
        count = jnp.zeros((W, M_pad), jnp.int32)

        for di, dj in _NEIGHBOR_OFFSETS:
            xs0 = sh(sx0, di, dj) + di * dx - cx
            ys0 = sh(sy0, di, dj) + dj * dy - cy
            xs1 = sh(sx1, di, dj) + di * dx - cx
            ys1 = sh(sy1, di, dj) + dj * dy - cy
            m = sh(pv, di, dj) > 0.5
            rx0 = ca * xs0 - sa * ys0
            ry0 = sa * xs0 + ca * ys0
            rx1 = ca * xs1 - sa * ys1
            ry1 = sa * xs1 + ca * ys1
            swap = rx0 > rx1
            bx = jnp.where(swap, rx1, rx0)
            by = jnp.where(swap, ry1, ry0)
            ex = jnp.where(swap, rx0, rx1)
            ey = jnp.where(swap, ry0, ry1)
            bx = jnp.where(m, bx, 0.0)
            by = jnp.where(m, by, 0.0)
            ex = jnp.where(m, ex, 1.0)
            ey = jnp.where(m, ey, 0.0)

            b1 = (ey - by) / (ex - bx)
            b0 = by - b1 * bx
            S0 = ex - bx
            S1 = 0.5 * (ex * ex - bx * bx)
            S2 = (ex * ex * ex - bx * bx * bx) / 3.0
            w = m.astype(dtype)
            A00 = A00 + w * S0 * S0
            A01 = A01 + w * S0 * S1
            A02 = A02 + w * S0 * S2
            A11 = A11 + w * S1 * S1
            A12 = A12 + w * S1 * S2
            A22 = A22 + w * S2 * S2
            rhs_r = b0 * S0 + b1 * S1
            d0v = d0v + w * S0 * rhs_r
            d1v = d1v + w * S1 * rhs_r
            d2v = d2v + w * S2 * rhs_r
            count = count + m.astype(jnp.int32)

        # Cramer (mirrors curvature._solve3_cramer for the symmetric A)
        det = (A00 * (A11 * A22 - A12 * A12)
               - A01 * (A01 * A22 - A12 * A02)
               + A02 * (A01 * A12 - A11 * A02))
        det1 = (A00 * (d1v * A22 - A12 * d2v)
                - d0v * (A01 * A22 - A12 * A02)
                + A02 * (A01 * d2v - d1v * A02))
        det2 = (A00 * (A11 * d2v - d1v * A12)
                - A01 * (A01 * d2v - d1v * A02)
                + d0v * (A01 * A12 - A11 * A02))
        c1 = det1 / det
        c2 = det2 / det
        curv = 2.0 * c2 / jnp.power(1.0 + c1 * c1, 1.5)
        curv = jnp.where(jnp.isfinite(curv), curv, 0.0)
        curv = jnp.where(t_valid & (count > 1), curv, 0.0)

        buf[:] = curv[8:8 + B]
        cp = pltpu.make_async_copy(buf, o_curv.at[band], sem_out.at[0])
        cp.start()
        cp.wait()

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    res = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=jax.ShapeDtypeStruct((n_bands, B, M_pad), dtype),
        in_specs=[hbm] * 4,
        out_specs=hbm,
        scratch_shapes=(
            [pltpu.VMEM((W, M_pad), dtype) for _ in range(4)]
            + [pltpu.VMEM((B, M_pad), dtype)]
            + [pltpu.SemaphoreType.DMA((4,)), pltpu.SemaphoreType.DMA((1,))]
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad(rnx), pad(rny), pad(rd), pad(validf))

    curv = res.reshape(n_bands * B, M_pad)[:N, :M]
    # ghost ring carries no curvature (valid is False there already, but the
    # shifted windows may have produced values on padded rows)
    return curv
