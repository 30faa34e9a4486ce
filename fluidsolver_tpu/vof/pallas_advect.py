"""Fused Pallas overlap kernel for the sparse VOF advection.

The sparse advection's overlap accumulation (``advect._overlap_from_neighbors``
— the 2D re-design of the reference's IRL overlap-volume cutting,
src/VOF.hpp:292-315) is 5 chained Sutherland-Hodgman clips on (9, m, K=16)
vertex buffers, with compaction after every clip via interleave +
``lax.sort``: ~100 XLA launches (and 6 TPU sorts) per advection, ~8 ms of
pure launch overhead in the tunnel's "timeable" windows (PERF.md "VOF advect
overlap chain").

This kernel runs the IDENTICAL clip pipeline for all 9 neighbors in ONE
``pallas_call`` over lane blocks, with two structural wins over the XLA
form (same math, same emission order):

  * **variable-size SoA vertex registers** instead of K=16 AoS buffers: the
    polygon is a Python list of (R, 128) registers that grows 8 -> 13 (one
    insertion max per convex half-plane clip), so each clip's compaction
    scatter is ``2*ns x (ns+1)`` selects on the *actual* slot count —
    ~4.5x fewer vector ops than fixed-K buffers;
  * **prefix-sum compaction in registers** instead of ``lax.sort``: the
    emitted-candidate positions are an exclusive running sum over the
    interleaved (vertex_i, intersection_i) sequence — the exact stable
    "flagged first, order preserved" semantics of the sort path — followed
    by a masked select-scatter. Candidate j can only land in output slot
    k <= j, which halves the scatter pairs.

The 9-neighbor loop is a minor grid dimension: the per-lane-block overlap
accumulator stays resident in VMEM across the 9 steps (standard revisited-
output accumulation). Rectangle clip planes are scalars derived from the
neighbor index in-kernel; only the PLIC half-plane is per-lane data.

Parity: arithmetic per clip (d, t, intersection, emission flags) mirrors
``advect._clip_halfplane`` term for term; vertex ORDER of the compacted
polygon is identical, so differences vs the XLA path are pure float
summation-order noise (shoelace + 9-neighbor accumulation), bounded by a
few ULP — asserted in tests/test_pallas_advect.py. Reference semantics:
overlap of the flux-corrected backtracked cell with each neighbor's
localized PLIC liquid region (src/VOF.hpp:292-315).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# max distinct vertices: octagon (8) + one insertion per half-plane clip (5)
_MAX_SLOTS = 13


def available(m: int, dtype, n0: int) -> bool:
    """Mosaic gate: f32 lanes only (f64 is emulated on TPU), octagon or
    quad start polygons."""
    return jnp.dtype(dtype) == jnp.float32 and n0 in (4, 8) and m >= 1


def _next(vals, n, ns):
    """next-vertex list: vals[(i+1) mod n] per lane for the leading ``n``
    valid slots (n is a per-lane int32 register). Slots >= n read the
    statically-next register — garbage exactly as harmless as the XLA
    path's rolled reads (every consumer masks them)."""
    return [jnp.where(n == i + 1, vals[0], vals[(i + 1) % ns])
            for i in range(ns)]


def _clip(xs, ys, n, a, b, c):
    """Sutherland-Hodgman clip of the SoA polygon against {a x + b y <= c}.

    xs, ys: lists of ns registers; n: per-lane valid count (int32 register);
    a, b, c: scalars (rect clips) or registers (PLIC clip). Returns
    (out_xs, out_ys, new_n) with ns+1 output registers, tail slots exactly
    zero (the zero-pad invariant the XLA path also maintains)."""
    ns = len(xs)
    zero = jnp.zeros_like(xs[0])
    one = jnp.ones_like(xs[0])

    valid = [n > i for i in range(ns)]
    ds = [a * x + b * y - c for x, y in zip(xs, ys)]
    inside = [(d <= 0.0) & v for d, v in zip(ds, valid)]
    xn = _next(xs, n, ns)
    yn = _next(ys, n, ns)
    dn = _next(ds, n, ns)
    # next-vertex inside flag from the SHIFTED d values, not a bool-payload
    # select (_next on a bool list): Mosaic stages i1 payloads through i8
    # and cannot truncate back (trunci i8->i1 is unsupported). The next
    # slot of a valid slot is always valid (j = (i+1) mod n < n), so the
    # valid mask is carried by the `& valid[i]` on the emit flag alone —
    # identical emission to the XLA path's masked _next_vertex(inside).
    inn = [d <= 0.0 for d in dn]

    # interleaved candidates: slot 2i = vertex i, slot 2i+1 = intersection
    # on edge i (identical emission order to advect._clip_halfplane)
    cand_x, cand_y, flags = [], [], []
    for i in range(ns):
        denom = ds[i] - dn[i]
        t = jnp.where(jnp.abs(denom) > 0.0,
                      ds[i] / jnp.where(denom == 0.0, one, denom), zero)
        cand_x.append(xs[i])
        cand_y.append(ys[i])
        flags.append(inside[i])
        cand_x.append(xs[i] + t * (xn[i] - xs[i]))
        cand_y.append(ys[i] + t * (yn[i] - ys[i]))
        flags.append((inside[i] ^ inn[i]) & valid[i])

    # stable compaction: exclusive prefix positions of the emitted items,
    # encoded as int32 slots (-1 = not emitted) so the stacked scatter
    # below never materializes a >2D bool tensor (Mosaic cannot truncate
    # a stacked i8 mask back to i1)
    sel = []
    run = jnp.zeros_like(n)
    for f in flags:
        sel.append(jnp.where(f, run, -1))
        run = run + f.astype(n.dtype)
    new_n = run

    # select-scatter, vectorized over the candidate axis: at most one
    # candidate hits each output slot (positions are strictly increasing at
    # emitted candidates), so the masked sum IS the select chain — but as
    # ~4 wide ops per output slot instead of ~2*ns register selects each
    # (the fully-unrolled form compiles >100x slower in XLA and Mosaic)
    cx = jnp.stack(cand_x)
    cy = jnp.stack(cand_y)
    sl = jnp.stack(sel)
    out_ns = ns + 1
    out_x, out_y = [], []
    for k in range(out_ns):
        hit = sl == k
        out_x.append(jnp.sum(jnp.where(hit, cx, 0.0), axis=0))
        out_y.append(jnp.sum(jnp.where(hit, cy, 0.0), axis=0))
    return out_x, out_y, new_n


def _area(xs, ys, n):
    """Shoelace area of the SoA polygon with per-lane count ``n``."""
    ns = len(xs)
    xn = _next(xs, n, ns)
    yn = _next(ys, n, ns)
    acc = jnp.zeros_like(xs[0])
    for i in range(ns):
        acc = acc + jnp.where(n > i, xs[i] * yn[i] - xn[i] * ys[i], 0.0)
    return 0.5 * acc


def _area_static(xs, ys):
    """Shoelace area with all len(xs) slots valid (the start polygon)."""
    ns = len(xs)
    acc = jnp.zeros_like(xs[0])
    for i in range(ns):
        j = (i + 1) % ns
        acc = acc + (xs[i] * ys[j] - xs[j] * ys[i])
    return 0.5 * acc


@functools.partial(jax.jit,
                   static_argnames=("dx", "dy", "lo", "interpret"))
def overlap_pallas(oct_x, oct_y, gathered, *, dx: float, dy: float,
                   lo: float, interpret: bool = False):
    """One-launch overlap accumulation for the sparse advection.

    oct_x, oct_y: (n0, m) stacked start-polygon slot coordinates
    (cell-local; n0 = 8 octagon or 4 quad, all slots valid).
    gathered: (5, 9, m) per-neighbor lane data [vf, mixed(0/1), plic_nx,
    plic_ny, plic_d] in ``advect._NEIGHBOR_OFFSETS`` order.
    lo: the dtype's VF_LOW cutoff (constants.vf_cutoffs).

    Returns (overlap, start_area), both (m,): the summed liquid overlap
    area over the 9 neighbors and the signed shoelace area of the start
    polygon (consumed for vf normalization + the volume-error diagnostic).
    """
    from jax.experimental import pallas as pl

    n0, m = oct_x.shape
    dtype = oct_x.dtype
    R = 32  # lane rows (of 128) per program
    m_pad = -(-m // (R * 128)) * (R * 128)
    mr = m_pad // 128
    ox = jnp.pad(oct_x, ((0, 0), (0, m_pad - m))).reshape(n0, mr, 128)
    oy = jnp.pad(oct_y, ((0, 0), (0, m_pad - m))).reshape(n0, mr, 128)
    g = jnp.pad(gathered, ((0, 0), (0, 0), (0, m_pad - m))).reshape(
        5, 9, mr, 128)
    nblk = mr // R

    def kernel(ox_ref, oy_ref, g_ref, ov_ref, ar_ref):
        nb = pl.program_id(1)
        di = (nb // 3 - 1).astype(dtype)
        dj = (nb % 3 - 1).astype(dtype)
        x_lo = di * dx
        y_lo = dj * dy

        xs = [ox_ref[i] for i in range(n0)]
        ys = [oy_ref[i] for i in range(n0)]

        @pl.when(nb == 0)
        def _init():
            ar_ref[...] = _area_static(xs, ys)
            ov_ref[...] = jnp.zeros_like(xs[0])

        n = jnp.full(xs[0].shape, n0, jnp.int32)
        # 4 rectangle clips (W, E, S, N — advect._overlap_from_neighbors
        # order), then the PLIC liquid half-plane
        xs, ys, n = _clip(xs, ys, n, -1.0, 0.0, -x_lo)
        xs, ys, n = _clip(xs, ys, n, 1.0, 0.0, x_lo + dx)
        xs, ys, n = _clip(xs, ys, n, 0.0, -1.0, -y_lo)
        xs, ys, n = _clip(xs, ys, n, 0.0, 1.0, y_lo + dy)

        vf_nb = g_ref[0, 0]
        mixed = g_ref[1, 0] > 0.5
        pnx = g_ref[2, 0]
        pny = g_ref[3, 0]
        pd = g_ref[4, 0]
        a_p = jnp.where(mixed, pnx, 0.0)
        b_p = jnp.where(mixed, pny, 0.0)
        c_p = jnp.where(mixed, pd + pnx * x_lo + pny * y_lo, 1.0)
        xs, ys, n = _clip(xs, ys, n, a_p, b_p, c_p)

        area = _area(xs, ys, n)
        ov_ref[...] += jnp.where(vf_nb > lo, area, 0.0)

    overlap, start_area = pl.pallas_call(
        kernel,
        grid=(nblk, 9),
        in_specs=[
            pl.BlockSpec((n0, R, 128), lambda i, nb: (0, i, 0)),
            pl.BlockSpec((n0, R, 128), lambda i, nb: (0, i, 0)),
            pl.BlockSpec((5, 1, R, 128), lambda i, nb: (0, nb, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, 128), lambda i, nb: (i, 0)),
            pl.BlockSpec((R, 128), lambda i, nb: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mr, 128), dtype),
            jax.ShapeDtypeStruct((mr, 128), dtype),
        ],
        interpret=interpret,
    )(ox, oy, g)
    return overlap.reshape(m_pad)[:m], start_area.reshape(m_pad)[:m]
