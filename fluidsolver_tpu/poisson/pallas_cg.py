"""Pallas TPU kernels: fused PCG iteration pieces (everything but M^-1).

One PCG iteration outside the preconditioner lowers to ~13 XLA fusions
(matvec, two dots, three axpys, norm, projection) — per iteration, ~55
iterations per step. Two kernels replace them:

  step_ab:  Ap = A p; pAp = <p, Ap>; alpha = rz/pAp; x += alpha p;
            r -= alpha Ap; rr = <r, r>                    (one launch)
  step_c:   z = project(z_raw); rz_new = <r, z>;
            beta = rz_new/rz; p = z + beta p              (one launch)

Both exploit that a Pallas TPU grid executes sequentially: grid =
(2, n_bands) runs ALL phase-0 bands before any phase-1 band, so a dot
product accumulated into SMEM scratch during phase 0 is complete when
phase 1 needs it (alpha / the projection mean / beta) — a reduction and
its consumers fuse into one launch without a host round trip.

Banding mirrors pallas_vcycle: data at rows [8, 8+N), band k's window is
statically rows [kB, kB+B+16), interiors written pre-aligned. Reduction
order (per-band partial sums, sequential accumulation) differs from
jnp.sum's tree reduction, so CG iterates differ from the XLA path at
rounding level — CG is self-correcting; tests pin convergence and the
solution, not bitwise iterates.

Replaces: the XLA lowering of the cg.solve_pcg while-loop body (reference
counterpart: HYPRE StructPCG internals, src/LinearSolver_StructHypre.hpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VMEM_BUDGET_BYTES = 9 * 1024 * 1024


# zero-fill masked shift — single definition in pallas_vcycle
from fluidsolver_tpu.poisson.pallas_vcycle import _shift_in  # noqa: E402


def _band_layout(N, M, n_arrays, dtype):
    """SHARED with pallas_vcycle.band_layout: the CG vectors and the fused
    smoother must agree on (B, M_pad, N_total) so the padded-carry PCG loop
    can hand the SAME (N_total, M_pad) buffers to step_ab, the fine-level
    fused_smooth (M^-1), and step_c without any repacking. n_arrays is
    ignored — the shared layout uses the vcycle's worst-case VMEM estimate,
    which is strictly more conservative than any pallas_cg variant needs
    (a smaller band just means more sequential grid steps, same bytes)."""
    del n_arrays
    from fluidsolver_tpu.poisson.pallas_vcycle import band_layout

    item = jnp.dtype(dtype).itemsize
    assert item in (4, 8), "pallas_cg: f32 (TPU) or f64 (interpret) only"
    B, n_bands, N_total, M_pad = band_layout(N, M, item)
    return B, M_pad, n_bands, N_total


def _offset(dtype) -> int:
    """Top data-row offset of the band layout — the dtype's sublane tile
    (pallas_vcycle._sublane; 8 for the f32/f64 the layout assert admits)."""
    from fluidsolver_tpu.poisson.pallas_vcycle import _sublane

    return _sublane(jnp.dtype(dtype).itemsize)


def pad_vec(a, shape):
    """Pad one (N, M) vector to the shared band layout — the padded-carry
    entry point (once per solve, before the while_loop)."""
    N, M = shape
    _, M_pad, _, N_total = _band_layout(N, M, 0, a.dtype)
    A = _offset(a.dtype)
    return jnp.pad(a, ((A, N_total - A - N), (0, M_pad - M)))


def extract_vec(a_pad, shape):
    """Inverse of pad_vec (once per solve, after the while_loop)."""
    N, M = shape
    A = _offset(a_pad.dtype)
    return a_pad[A:A + N, :M]


def pad_operator(op, shape):
    """Pad the five coefficient planes to the band layout ONCE — called
    before the CG while_loop so the (loop-invariant) pads are guaranteed
    hoisted instead of relying on XLA's while-loop code motion."""
    N, M = shape
    dtype = op.aC.dtype
    B, M_pad, n_bands, N_total = _band_layout(N, M, 9, dtype)

    A = _offset(dtype)

    def pad(a):
        return jnp.pad(a, ((A, N_total - A - a.shape[0]),
                           (0, M_pad - a.shape[1])))

    return tuple(pad(getattr(op, n)) for n in ("aC", "aL", "aR", "aB", "aT"))


def available(shape, dtype=None) -> bool:
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False  # f64 is emulated on TPU; Mosaic rejects it
    return shape[0] >= 32 and shape[1] >= 2


@functools.partial(jax.jit,
                   static_argnames=("interpret", "padded_io", "shape"))
def step_ab(op, x, r, p, rz, interpret=False, padded_io=False, shape=None):
    """(x', r', pAp, rr, sum_r) — the alpha half of a PCG iteration, fused.
    ``op`` is either a StencilOp (padded here) or the pre-padded 5-tuple
    from pad_operator (the loop-hoisted production form). sum_r = sum of
    the updated residual, accumulated for free for step_c's projected dot.

    ``padded_io``: x/r/p arrive AND return in the shared (N_total, M_pad)
    band layout (pad_vec) — the padded-carry contract; ``shape`` must give
    the raw (N, M). Zero stays zero in every pad cell (coefs are zero
    there), so dot products over band interiors remain exact."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = shape if padded_io else x.shape
    dtype = x.dtype
    B, M_pad, n_bands, N_total = _band_layout(N, M, 9, dtype)
    W = B + 16
    A = _offset(dtype)

    def pad(a):
        return jnp.pad(a, ((A, N_total - A - a.shape[0]),
                           (0, M_pad - a.shape[1])))

    coefs_pad = (op if isinstance(op, tuple)
                 else tuple(pad(getattr(op, n))
                            for n in ("aC", "aL", "aR", "aB", "aT")))
    if padded_io:
        assert x.shape == (N_total, M_pad), (x.shape, (N_total, M_pad))
        vecs = [x, r, p]
    else:
        vecs = [pad(x), pad(r), pad(p)]
    args = (list(coefs_pad)
            + vecs + [jnp.reshape(rz.astype(dtype), (1, 1))])
    n_in = len(args)  # 9; ins[8] is the SMEM rz scalar

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + 4]      # x', r', Ap bands, scalars (1,2)
        win = refs[n_in + 4:n_in + 4 + 6]      # six (W, M_pad) buffers
        buf = refs[n_in + 10:n_in + 12]        # two (B, M_pad) buffers
        zbuf = refs[n_in + 12] if padded_io else None
        acc = refs[-3]                          # SMEM (3,): pAp, rr, sum_r
        sem_in = refs[-2]
        sem_out = refs[-1]

        phase = pl.program_id(0)
        band = pl.program_id(1)
        start = pl.multiple_of(band * B, 8)

        @pl.when((phase == 0) & (band == 0))
        def _init():
            acc[0] = jnp.zeros((), dtype)
            acc[1] = jnp.zeros((), dtype)
            acc[2] = jnp.zeros((), dtype)

        def load(src_idx, dst, sem_idx):
            cp = pltpu.make_async_copy(
                ins[src_idx].at[pl.ds(start, W), :], dst, sem_in.at[sem_idx])
            cp.start()
            return cp

        @pl.when(phase == 0)
        def _matvec():
            cps = [load(i, win[i], i) for i in range(5)]
            cps.append(load(7, win[5], 5))  # p
            for cp in cps:
                cp.wait()
            aC, aL, aR, aB, aT = (win[i][:] for i in range(5))
            pw = win[5][:]
            Ap = (
                aC * pw
                + aL * _shift_in(pw, -1, 0) + aR * _shift_in(pw, 1, 0)
                + aB * _shift_in(pw, 0, -1) + aT * _shift_in(pw, 0, 1)
            )[8:8 + B]
            acc[0] = acc[0] + jnp.sum(pw[8:8 + B] * Ap)
            buf[0][:] = Ap
            cp = pltpu.make_async_copy(buf[0], outs[2].at[band],
                                       sem_out.at[0])
            cp.start()
            cp.wait()

        @pl.when(phase == 1)
        def _axpy():
            cps = [load(5, win[0], 0), load(6, win[1], 1), load(7, win[2], 2)]
            cp_ap = pltpu.make_async_copy(
                outs[2].at[band], buf[0], sem_in.at[3])
            cp_ap.start()
            for cp in cps:
                cp.wait()
            cp_ap.wait()
            xw = win[0][:][8:8 + B]
            rw = win[1][:][8:8 + B]
            pw = win[2][:][8:8 + B]
            Ap = buf[0][:]
            pAp = acc[0]
            alpha = ins[8][0, 0] / jnp.where(pAp != 0.0, pAp, 1.0)
            r_new = rw - alpha * Ap
            acc[1] = acc[1] + jnp.sum(r_new * r_new)
            acc[2] = acc[2] + jnp.sum(r_new)
            buf[0][:] = xw + alpha * pw
            buf[1][:] = r_new
            if padded_io:
                # contiguous padded outputs (rows [8+start, 8+start+B)) so
                # the next call consumes them with zero repacking; band 0
                # zeroes the never-written edge rows (uninitialized HBM
                # would poison the halo reads: NaN x 0-coef = NaN)
                cpx = pltpu.make_async_copy(
                    buf[0], outs[0].at[pl.ds(8 + start, B)], sem_out.at[1])
                cpr = pltpu.make_async_copy(
                    buf[1], outs[1].at[pl.ds(8 + start, B)], sem_out.at[2])

                @pl.when(band == 0)
                def _zero_edges():
                    zbuf[:] = jnp.zeros((8, M_pad), dtype)
                    zs = [pltpu.make_async_copy(
                        zbuf, outs[k].at[pl.ds(row, 8)], sem_out.at[s])
                        for s, (k, row) in enumerate(
                            [(0, 0), (0, N_total - 8),
                             (1, 0), (1, N_total - 8)], start=3)]
                    for z in zs:
                        z.start()
                    for z in zs:
                        z.wait()
            else:
                cpx = pltpu.make_async_copy(buf[0], outs[0].at[band],
                                            sem_out.at[1])
                cpr = pltpu.make_async_copy(buf[1], outs[1].at[band],
                                            sem_out.at[2])
            cpx.start()
            cpr.start()
            cpx.wait()
            cpr.wait()

            @pl.when(band == n_bands - 1)
            def _scalars():
                outs[3][0, 0] = acc[0]
                outs[3][0, 1] = acc[1]
                outs[3][0, 2] = acc[2]

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vec_shape = ((N_total, M_pad) if padded_io else (n_bands, B, M_pad))
    res = pl.pallas_call(
        kernel,
        grid=(2, n_bands),
        out_shape=(
            jax.ShapeDtypeStruct(vec_shape, dtype),
            jax.ShapeDtypeStruct(vec_shape, dtype),
            jax.ShapeDtypeStruct((n_bands, B, M_pad), dtype),
            jax.ShapeDtypeStruct((1, 3), dtype),
        ),
        in_specs=[hbm] * 8 + [smem],
        out_specs=(hbm, hbm, hbm, smem),
        scratch_shapes=(
            [pltpu.VMEM((W, M_pad), dtype) for _ in range(6)]
            + [pltpu.VMEM((B, M_pad), dtype) for _ in range(2)]
            + ([pltpu.VMEM((8, M_pad), dtype)] if padded_io else [])
            + [pltpu.SMEM((3,), dtype),
               pltpu.SemaphoreType.DMA((6,)),
               pltpu.SemaphoreType.DMA((7 if padded_io else 3,))]
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    def extract(bands):
        if padded_io:
            return bands
        return bands.reshape(n_bands * B, M_pad)[:N, :M]

    return (extract(res[0]), extract(res[1]),
            res[3][0, 0].astype(rz.dtype), res[3][0, 1].astype(rz.dtype),
            res[3][0, 2].astype(rz.dtype))


@functools.partial(jax.jit, static_argnames=("singular", "interpret",
                                              "padded_io", "shape"))
def step_c(r, z_raw, p, rz_prev, singular, sum_r=None, interpret=False,
           padded_io=False, shape=None):
    """(z, p', rz_new): z = z_raw - mean(z_raw) (if singular), rz_new =
    <r, z>, p' = z + (rz_new / rz_prev) p — fused. The projected dot uses
    <r, z - m> = <r, z_raw> - m * sum(r); sum(r) comes from step_ab's
    accumulator (or is reduced here as a fallback).

    ``padded_io``: r/z_raw/p arrive AND return in the shared (N_total,
    M_pad) band layout; ``shape`` = raw (N, M). The singular projection
    subtracts the mean on VALID cells only (in-kernel row/col mask), so
    the zero-pad invariant of the padded-carry loop is preserved.

    ``p=None``: the solve-init form (p0 implicitly zero): p' = z, so the
    p input/output is elided entirely and the returned z and p' are the
    SAME array (safe: while-loop carries are read-only inputs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = shape if padded_io else r.shape
    dtype = r.dtype
    B, M_pad, n_bands, N_total = _band_layout(N, M, 5, dtype)
    W = B + 16
    inv_cells = 1.0 / float(N * M)
    p_zero = p is None
    n_vec = 2 if p_zero else 3
    A = _offset(dtype)

    def pad(a):
        return jnp.pad(a, ((A, N_total - A - a.shape[0]),
                           (0, M_pad - a.shape[1])))

    if sum_r is None:
        sum_r = jnp.sum(r) if singular else jnp.zeros((), r.dtype)
    scalars_in = jnp.stack(
        [rz_prev.astype(dtype), sum_r.astype(dtype)]).reshape(1, 2)
    if padded_io:
        assert r.shape == (N_total, M_pad), (r.shape, (N_total, M_pad))
        args = [r, z_raw] + ([] if p_zero else [p]) + [scalars_in]
    else:
        args = [pad(r), pad(z_raw)] + ([] if p_zero else [pad(p)]) \
            + [scalars_in]

    n_out = 2 if p_zero else 3

    def kernel(*refs):
        ins = refs[:n_vec + 1]
        outs = refs[n_vec + 1:n_vec + 1 + n_out]  # z[, p'], rz_new (1,1)
        win = refs[n_vec + 1 + n_out:n_vec + 1 + n_out + n_vec]
        buf = refs[n_vec + 1 + n_out + n_vec:
                   n_vec + 1 + n_out + n_vec + (n_out - 1)]
        zbuf = refs[-4] if padded_io else None
        acc = refs[-3]              # SMEM (2,): sum_z, <r, z_raw>
        sem_in = refs[-2]
        sem_out = refs[-1]

        phase = pl.program_id(0)
        band = pl.program_id(1)
        start = pl.multiple_of(band * B, 8)

        @pl.when((phase == 0) & (band == 0))
        def _init():
            acc[0] = jnp.zeros((), dtype)
            acc[1] = jnp.zeros((), dtype)

        def load(src_idx, dst, sem_idx):
            cp = pltpu.make_async_copy(
                ins[src_idx].at[pl.ds(start, W), :], dst, sem_in.at[sem_idx])
            cp.start()
            return cp

        @pl.when(phase == 0)
        def _sums():
            cps = [load(0, win[0], 0), load(1, win[1], 1)]
            for cp in cps:
                cp.wait()
            rw = win[0][:][8:8 + B]
            zw = win[1][:][8:8 + B]
            if singular:
                acc[0] = acc[0] + jnp.sum(zw)
            acc[1] = acc[1] + jnp.sum(rw * zw)

        @pl.when(phase == 1)
        def _update():
            cps = [load(1, win[1], 1)]
            if not p_zero:
                cps.append(load(2, win[2], 2))
            for cp in cps:
                cp.wait()
            zw = win[1][:][8:8 + B]
            mean_z = acc[0] * inv_cells if singular else jnp.zeros((), dtype)
            rz_new = acc[1] - mean_z * ins[n_vec][0, 1]
            z_proj = zw - mean_z
            if padded_io and singular:
                # mean subtraction on VALID cells only: an unmasked -mean
                # in the pad cells would break the zero-pad invariant every
                # subsequent dot/matvec relies on
                ii = jax.lax.broadcasted_iota(jnp.int32, (B, M_pad), 0) + start
                jj = jax.lax.broadcasted_iota(jnp.int32, (B, M_pad), 1)
                z_proj = jnp.where((ii < N) & (jj < M), z_proj, 0.0)
            buf[0][:] = z_proj
            if not p_zero:
                pw = win[2][:][8:8 + B]
                beta = rz_new / jnp.where(ins[n_vec][0, 0] != 0.0,
                                          ins[n_vec][0, 0], 1.0)
                buf[1][:] = z_proj + beta * pw
            if padded_io:
                cps_out = [pltpu.make_async_copy(
                    buf[k], outs[k].at[pl.ds(8 + start, B)], sem_out.at[k])
                    for k in range(n_out - 1)]

                @pl.when(band == 0)
                def _zero_edges():
                    zbuf[:] = jnp.zeros((8, M_pad), dtype)
                    zs = [pltpu.make_async_copy(
                        zbuf, outs[k].at[pl.ds(row, 8)], sem_out.at[s])
                        for s, (k, row) in enumerate(
                            [(k, row) for k in range(n_out - 1)
                             for row in (0, N_total - 8)],
                            start=n_out - 1)]
                    for z in zs:
                        z.start()
                    for z in zs:
                        z.wait()
            else:
                cps_out = [pltpu.make_async_copy(
                    buf[k], outs[k].at[band], sem_out.at[k])
                    for k in range(n_out - 1)]
            for cp in cps_out:
                cp.start()
            for cp in cps_out:
                cp.wait()

            @pl.when(band == n_bands - 1)
            def _scalars():
                outs[n_out - 1][0, 0] = rz_new

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vec_shape = ((N_total, M_pad) if padded_io else (n_bands, B, M_pad))
    res = pl.pallas_call(
        kernel,
        grid=(2, n_bands),
        out_shape=(
            tuple(jax.ShapeDtypeStruct(vec_shape, dtype)
                  for _ in range(n_out - 1))
            + (jax.ShapeDtypeStruct((1, 1), dtype),)
        ),
        in_specs=[hbm] * n_vec + [smem],
        out_specs=(hbm,) * (n_out - 1) + (smem,),
        scratch_shapes=(
            [pltpu.VMEM((W, M_pad), dtype) for _ in range(n_vec)]
            + [pltpu.VMEM((B, M_pad), dtype) for _ in range(n_out - 1)]
            + ([pltpu.VMEM((8, M_pad), dtype)] if padded_io else [])
            + [pltpu.SMEM((2,), dtype),
               pltpu.SemaphoreType.DMA((n_vec,)),
               pltpu.SemaphoreType.DMA(
                   ((n_out - 1) * 3 if padded_io else n_out - 1,))]
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    def extract(bands):
        if padded_io:
            return bands
        return bands.reshape(n_bands * B, M_pad)[:N, :M]

    z_out = extract(res[0])
    p_out = z_out if p_zero else extract(res[1])
    return z_out, p_out, res[n_out - 1][0, 0].astype(rz_prev.dtype)


@functools.partial(jax.jit, static_argnames=("singular", "shape",
                                             "interpret"))
def step_init(op, b_pad, x0_pad, singular, shape, interpret=False):
    """(x0', r0', bb, rr0, sum_r0) — the whole PCG pre-loop init, fused.

    Replaces the ~10 XLA kernels a solve pays before its first iteration
    (cg.solve_pcg init: project(b), <b,b>, project(x0), the warm-start
    residual b - A x0 with its accept/reject dots, rel0, sum(r0)) with ONE
    banded launch in the padded-carry layout. x5 solves/step these were
    ~25 of the ~1520 executed kernels/step (PERF.md round-4 ledger item 3;
    reference solve-entry analog: src/LinearSolver_StructHypre.hpp:119-143,
    which always cold-starts).

    op: pre-padded 5-tuple (pad_operator). b_pad/x0_pad: band-padded
    (pad_vec); x0_pad=None = cold start. Returns band-padded x0', r0' and
    scalars bb = <b1,b1> (b1 = projected b), rr0 = <r0,r0>, sum_r0 =
    sum(r0) (consumed by step_c's projected first dot).

    Semantics mirror the XLA init exactly: b1 = b - mean(b) (singular),
    x1 = x0 - mean(x0); the guess is kept iff <b1 - A x1, same> < <b1,b1>,
    else (x0', r0') = (0, b1). Reduction order is per-band sequential (the
    fused-kernel contract: differs from jnp.sum at rounding level)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = shape
    dtype = b_pad.dtype
    B, M_pad, n_bands, N_total = _band_layout(N, M, 9, dtype)
    W = B + 16
    inv_cells = 1.0 / float(N * M)
    warm = x0_pad is not None
    assert b_pad.shape == (N_total, M_pad), (b_pad.shape, (N_total, M_pad))

    if warm:
        args = list(op) + [b_pad, x0_pad]
        i_b, i_x = 5, 6
    else:
        args = [b_pad]
        i_b, i_x = 0, None
    n_in = len(args)
    n_outs = 4 if warm else 3  # x0', r0', scalars (1,3) [, r_ws bands]

    ph_mean = 0 if singular else None
    ph_resid = 1 if singular else 0
    ph_select = ph_resid + 1 if warm else None
    n_phases = ph_resid + 1 + (1 if warm else 0)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + n_outs]
        win = refs[n_in + n_outs:n_in + n_outs + n_in]
        buf = refs[n_in + n_outs + n_in:n_in + n_outs + n_in + 2]
        zbuf = refs[-4]
        acc = refs[-3]  # SMEM (6,): sum_b, sum_x, bb, rr_ws, sum_b1, sum_rws
        sem_in = refs[-2]
        sem_out = refs[-1]

        phase = pl.program_id(0)
        band = pl.program_id(1)
        start = pl.multiple_of(band * B, 8)

        @pl.when((phase == 0) & (band == 0))
        def _init():
            for i in range(6):
                acc[i] = jnp.zeros((), dtype)

        def load(src_idx, sem_idx=None):
            cp = pltpu.make_async_copy(
                ins[src_idx].at[pl.ds(start, W), :], win[src_idx],
                sem_in.at[src_idx if sem_idx is None else sem_idx])
            cp.start()
            return cp

        def valid_int():
            ii = jax.lax.broadcasted_iota(jnp.int32, (B, M_pad), 0) + start
            jj = jax.lax.broadcasted_iota(jnp.int32, (B, M_pad), 1)
            return (ii < N) & (jj < M)

        def projected_b():
            mean_b = acc[0] * inv_cells if singular \
                else jnp.zeros((), dtype)
            return jnp.where(valid_int(),
                             win[i_b][:][8:8 + B] - mean_b, 0.0)

        def projected_x_window():
            mean_x = acc[1] * inv_cells if singular else jnp.zeros((), dtype)
            iiw = jax.lax.broadcasted_iota(jnp.int32, (W, M_pad), 0) + start
            jjw = jax.lax.broadcasted_iota(jnp.int32, (W, M_pad), 1)
            vw = (iiw >= 8) & (iiw < 8 + N) & (jjw < M)
            return jnp.where(vw, win[i_x][:] - mean_x, 0.0)

        def write_outputs(x_band, r_band):
            buf[0][:] = x_band
            buf[1][:] = r_band
            cps = [pltpu.make_async_copy(
                buf[k], outs[k].at[pl.ds(8 + start, B)], sem_out.at[k])
                for k in range(2)]

            @pl.when(band == 0)
            def _zero_edges():
                zbuf[:] = jnp.zeros((8, M_pad), dtype)
                zs = [pltpu.make_async_copy(
                    zbuf, outs[k].at[pl.ds(row, 8)], sem_out.at[s])
                    for s, (k, row) in enumerate(
                        [(k, row) for k in range(2)
                         for row in (0, N_total - 8)], start=3)]
                for z in zs:
                    z.start()
                for z in zs:
                    z.wait()

            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        if singular:
            @pl.when(phase == ph_mean)
            def _means():
                cps = [load(i_b)]
                if warm:
                    cps.append(load(i_x))
                for cp in cps:
                    cp.wait()
                acc[0] = acc[0] + jnp.sum(win[i_b][:][8:8 + B])
                if warm:
                    acc[1] = acc[1] + jnp.sum(win[i_x][:][8:8 + B])

        @pl.when(phase == ph_resid)
        def _resid():
            cps = [load(i) for i in range(n_in)] if warm else [load(i_b)]
            for cp in cps:
                cp.wait()
            b1 = projected_b()
            acc[2] = acc[2] + jnp.sum(b1 * b1)
            acc[4] = acc[4] + jnp.sum(b1)
            if warm:
                x1w = projected_x_window()
                aC, aL, aR, aB, aT = (win[i][:] for i in range(5))
                Ax = (
                    aC * x1w
                    + aL * _shift_in(x1w, -1, 0) + aR * _shift_in(x1w, 1, 0)
                    + aB * _shift_in(x1w, 0, -1) + aT * _shift_in(x1w, 0, 1)
                )[8:8 + B]
                rws = b1 - Ax
                acc[3] = acc[3] + jnp.sum(rws * rws)
                acc[5] = acc[5] + jnp.sum(rws)
                buf[1][:] = rws
                cp = pltpu.make_async_copy(buf[1], outs[3].at[band],
                                           sem_out.at[2])
                cp.start()
                cp.wait()
            else:
                write_outputs(jnp.zeros((B, M_pad), dtype), b1)

                @pl.when(band == n_bands - 1)
                def _scalars_cold():
                    outs[2][0, 0] = acc[2]
                    outs[2][0, 1] = acc[2]
                    outs[2][0, 2] = acc[4]

        if warm:
            @pl.when(phase == ph_select)
            def _select():
                cps = [load(i_b), load(i_x)]
                cp_r = pltpu.make_async_copy(
                    outs[3].at[band], buf[1], sem_in.at[n_in])
                cp_r.start()
                for cp in cps:
                    cp.wait()
                cp_r.wait()
                good = acc[3] < acc[2]
                b1 = projected_b()
                x1 = projected_x_window()[8:8 + B]
                rws = buf[1][:]
                write_outputs(jnp.where(good, x1, 0.0),
                              jnp.where(good, rws, b1))

                @pl.when(band == n_bands - 1)
                def _scalars():
                    outs[2][0, 0] = acc[2]
                    outs[2][0, 1] = jnp.where(good, acc[3], acc[2])
                    outs[2][0, 2] = jnp.where(good, acc[5], acc[4])

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((N_total, M_pad), dtype),
        jax.ShapeDtypeStruct((N_total, M_pad), dtype),
        jax.ShapeDtypeStruct((1, 3), dtype),
    ]
    out_specs = [hbm, hbm, smem]
    if warm:
        out_shape.append(jax.ShapeDtypeStruct((n_bands, B, M_pad), dtype))
        out_specs.append(hbm)
    res = pl.pallas_call(
        kernel,
        grid=(n_phases, n_bands),
        out_shape=tuple(out_shape),
        in_specs=[hbm] * n_in,
        out_specs=tuple(out_specs),
        scratch_shapes=(
            [pltpu.VMEM((W, M_pad), dtype) for _ in range(n_in)]
            + [pltpu.VMEM((B, M_pad), dtype) for _ in range(2)]
            + [pltpu.VMEM((8, M_pad), dtype)]
            + [pltpu.SMEM((6,), dtype),
               pltpu.SemaphoreType.DMA((n_in + 1,)),
               pltpu.SemaphoreType.DMA((7,))]
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    scal = res[2]
    return res[0], res[1], scal[0, 0], scal[0, 1], scal[0, 2]
