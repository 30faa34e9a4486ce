"""Pallas TPU kernels: temporally-blocked red-black smoothing.

The V-cycle's cost is HBM traffic: in XLA each red/black half-sweep is its
own pass over (aC..aT, b, x), so a V(2,2) level visit moves ~35 array-passes
(4 half-steps per smoothing phase + residual). ``fused_smooth`` fuses an
entire smoothing phase — all half-steps plus (optionally) the residual —
into ONE pass: each coefficient band is DMA'd to VMEM once, every half-step
runs on-chip, and only the results stream back.

Correctness uses trapezoidal (overlapped-band) blocking: each band is
loaded with an H-deep halo, H = number of half-steps (+1 when the residual
is computed). Every half-step invalidates one more halo ring; the interior
rows written back are exact — identical arithmetic to the unfused XLA
color updates in boxmg._rb_sweep (validated in tests via interpret mode).

Scope: 5-point (finest) and 9-point (Galerkin-coarsened) levels of
poisson/boxmg.py hierarchies. Callers gate on ``available()``.

The grid-transfer operators fuse in as well: with the BoxMG weights packed
into two FINE-shaped parity planes (``pack_transfer``), restriction is nine
static ±1 shifts of weight*residual products (computed while r is still in
VMEM — the fine residual never round-trips to HBM) and prolongation+
correction is a prologue of the post-smoothing kernel (the coarse error is
pre-upsampled by nearest-neighbor in XLA so every P entry is a ±1 shift).
This replaces boxmg.restrict_box / prolong_box (~22 XLA kernel launches
per level visit) with in-kernel epilogue/prologue math.

Packed-plane layout (values stored AT fine parity slots; (p,q) = (i%2,j%2)):
  planeU: (1,0)=pW  (0,0)=pE[k,l]@(2k,2l)    (0,1)=pS  (1,1)=pN[k,l]@(2k+1,2l+1)
  planeV: (1,1)=pSW (0,1)=pSE[k,l]@(2k,2l+1) (1,0)=pNW[k,l]@(2k+1,2l)
          (0,0)=pNE[k,l]@(2k,2l)
i.e. every family sits at its natural parity except where two families
share one (pW/pE, pS/pN, the corners) — the second family is stored one
step backward and un-shifted at use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def pack_transfer(tr, fine_shape):
    """BoxTransfer -> (planeU, planeV) parity-packed planes, shape
    (2Nc, 2Mc) — NOT trimmed to the fine shape: for odd N the pN family
    (natural parity (0,1), stored one row down at (1,1)) carries real
    entries at row 2(Nc-1)+1 = N, one past the fine grid. fused_smooth
    zero-pads every operand to the band layout per-array, and N_pad >= 2Nc
    always holds (bands are even-sized, so odd N rounds up).

    Built once per level at hierarchy-build time (XLA interleave, same
    trick as boxmg.prolong_box); consumed by fused_smooth's in-kernel
    restriction/prolongation.
    """
    del fine_shape
    Nc, Mc = tr.pW.shape

    def interleave(a00, a01, a10, a11):
        # value at fine (2k+p, 2l+q) = a{pq}[k, l]
        row_even = jnp.stack([a00, a01], axis=-1).reshape(Nc, 2 * Mc)
        row_odd = jnp.stack([a10, a11], axis=-1).reshape(Nc, 2 * Mc)
        return jnp.stack([row_even, row_odd], axis=1).reshape(2 * Nc, 2 * Mc)

    planeU = interleave(tr.pE, tr.pS, tr.pW, tr.pN)
    planeV = interleave(tr.pNE, tr.pSE, tr.pNW, tr.pSW)
    return planeU, planeV


def _shift_in(x, di, dj):
    """x[i+di, j+dj] with zero fill (Mosaic-safe: roll + iota mask)."""
    from jax.experimental.pallas import tpu as pltpu

    n, m = x.shape
    out = x
    if di:
        out = pltpu.roll(out, (-di) % n, 0)  # roll requires shift >= 0
        ii = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        keep = (ii + di >= 0) & (ii + di < n)
        out = jnp.where(keep, out, 0.0)
    if dj:
        out = pltpu.roll(out, (-dj) % m, 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        keep = (jj + dj >= 0) & (jj + dj < m)
        out = jnp.where(keep, out, 0.0)
    return out


def _apply_coefs(coefs, x):
    """Apply a 5- or 9-coefficient stencil (order matches linsys.apply_op /
    boxmg.apply_op9) to the in-VMEM window."""
    aC, aL, aR, aB, aT = coefs[:5]
    out = (
        aC * x
        + aL * _shift_in(x, -1, 0) + aR * _shift_in(x, 1, 0)
        + aB * _shift_in(x, 0, -1) + aT * _shift_in(x, 0, 1)
    )
    if len(coefs) == 9:
        aSW, aSE, aNW, aNE = coefs[5:]
        out = (
            out
            + aSW * _shift_in(x, -1, -1) + aSE * _shift_in(x, 1, -1)
            + aNW * _shift_in(x, -1, 1) + aNE * _shift_in(x, 1, 1)
        )
    return out


def _make_kernel(colors, residual, has_x0, has_tr, has_corr, restrict,
                 ncoef, M, B, H, W, dtype, A, padded_out=False, N_total=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_in = ncoef + 1 + (1 if has_x0 else 0) + (2 if has_tr else 0) \
        + (1 if has_corr else 0)
    n_out = 2 if (residual or restrict) else 1
    # storage dtype may be narrow (bf16: half the HBM traffic); arithmetic
    # runs in >= f32 — Mosaic's bf16 vector-op coverage is partial (the
    # original all-bf16 kernel crashed), while bf16<->f32 converts are the
    # standard matmul-input path. The f32 compute also keeps the smoother's
    # contraction close to the f32 hierarchy's. f32/f64 (interpret-mode)
    # storage computes in its own dtype — bit-exact vs the XLA sweeps.
    cdt = jnp.promote_types(dtype, jnp.float32)

    def kernel(*refs):
        # separate 2D scratch buffers per array: indexing one 3D VMEM slab
        # requires 128-aligned lanes, which general M is not
        ins = refs[:n_in]
        outs = refs[n_in:n_in + n_out]
        scratch = refs[n_in + n_out:n_in + n_out + n_in]
        out_buf = refs[n_in + n_out + n_in:n_in + n_out + n_in + n_out]
        zbuf = refs[n_in + n_out + n_in + n_out] if padded_out else None
        sem_in = refs[-2]
        sem_out = refs[-1]

        band = pl.program_id(0)
        # the wrapper zero-pads A rows on TOP as well, so band k's window
        # is statically rows [kB, kB + B + 2A) with its interior at local
        # [A, A+B) — no clamping, and the interior offset is static
        # (A = sublane tile: 8 for f32, 16 for bf16)
        start = pl.multiple_of(band * B, A)

        dmas = [
            pltpu.make_async_copy(
                ins[i].at[pl.ds(start, W), :], scratch[i], sem_in.at[i]
            )
            for i in range(n_in)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        coefs = tuple(scratch[i][:].astype(cdt) for i in range(ncoef))
        aC = coefs[0]
        b = scratch[ncoef][:].astype(cdt)
        k = ncoef + 1
        x = scratch[k][:].astype(cdt) if has_x0 else jnp.zeros((W, M), cdt)
        k += 1 if has_x0 else 0
        if has_tr:
            pU = scratch[k][:].astype(cdt)
            pV = scratch[k + 1][:].astype(cdt)
            k += 2
        if has_corr:
            e = scratch[k][:].astype(cdt)

        sh = _shift_in
        ii = jax.lax.broadcasted_iota(jnp.int32, (W, M), 0) + start
        jj = jax.lax.broadcasted_iota(jnp.int32, (W, M), 1)
        red = (((ii + jj) % 2) == 0).astype(cdt)
        aC_safe = jnp.where(aC == 0.0, 1.0, aC)

        if has_corr:
            # prolongation + correction prologue: x += P e, with e the
            # nearest-neighbor-upsampled coarse error (so ec(k+di, l+dj)
            # is a ±1 shift) and the weights read from the packed parity
            # planes (see module docstring). Term order = boxmg.prolong_box.
            corr_oe = pU * sh(e, -1, 0) + sh(pU, -1, 0) * sh(e, 1, 0)
            corr_eo = pU * sh(e, 0, -1) + sh(pU, 1, 0) * sh(e, 0, 1)
            corr_oo = (
                pV * sh(e, -1, -1) + sh(pV, -1, 0) * sh(e, 1, -1)
                + sh(pV, 0, -1) * sh(e, -1, 1)
                + sh(pV, -1, -1) * sh(e, 1, 1)
            )
            even_i = (ii % 2) == 0
            even_j = (jj % 2) == 0
            corr = jnp.where(
                even_i, jnp.where(even_j, e, corr_eo),
                jnp.where(even_j, corr_oe, corr_oo),
            )
            x = x + corr

        for want_red in colors:
            ax_off = _apply_coefs(coefs, x) - aC * x
            x_new = (b - ax_off) / aC_safe
            mask = red if want_red else 1.0 - red
            x = jnp.where(mask > 0.5, x_new, x)

        # write each band's interior rows [A, A+B) only — a static
        # tile-aligned sublane slice — so the wrapper's extraction is a
        # single reshape instead of per-band slices + concatenate
        out_buf[0][:] = x[A:A + B].astype(dtype)
        if residual or restrict:
            r = b - _apply_coefs(coefs, x)
            if restrict:
                # restriction epilogue: R = P^T r while r is still in VMEM;
                # valid at even-even positions (the wrapper's [0::2, 0::2]
                # is the coarse grid). Term order = boxmg.restrict_box.
                P1 = pU * r          # pW at odd-even / pS at even-odd
                P2 = pV * r          # pSW at odd-odd
                r = (
                    r
                    + sh(P1, 1, 0)
                    + sh(sh(pU, -1, 0) * r, -1, 0)
                    + sh(P1, 0, 1)
                    + sh(sh(pU, 1, 0) * r, 0, -1)
                    + sh(P2, 1, 1)
                    + sh(sh(pV, -1, 0) * r, -1, 1)
                    + sh(sh(pV, 0, -1) * r, 1, -1)
                    + sh(sh(pV, -1, -1) * r, -1, -1)
                )
            out_buf[1][:] = r[A:A + B].astype(dtype)

        if padded_out:
            # x streams back CONTIGUOUS into a (N_total, M_pad) buffer at
            # rows [A+start, A+start+B) — the same layout the kernel reads,
            # so the caller can chain calls with zero repacking (padded-
            # carry PCG). The never-written edge rows [0, A) and
            # [N_total-A, N_total) are zeroed by band 0: they are read as
            # halo by the next call's band-0/last-band windows, and
            # uninitialized HBM there (NaN x 0-coefficient = NaN) would
            # poison the zero-pad invariant the banded math relies on.
            outs_dma = [pltpu.make_async_copy(
                out_buf[0], outs[0].at[pl.ds(A + start, B)], sem_out.at[0])]
            for k in range(1, n_out):
                outs_dma.append(pltpu.make_async_copy(
                    out_buf[k], outs[k].at[band], sem_out.at[k]))

            @pl.when(band == 0)
            def _zero_edges():
                zbuf[:] = jnp.zeros((A, M), dtype)
                z0 = pltpu.make_async_copy(
                    zbuf, outs[0].at[pl.ds(0, A)], sem_out.at[n_out])
                z1 = pltpu.make_async_copy(
                    zbuf, outs[0].at[pl.ds(N_total - A, A)],
                    sem_out.at[n_out + 1])
                z0.start()
                z1.start()
                z0.wait()
                z1.wait()
        else:
            outs_dma = [
                pltpu.make_async_copy(
                    out_buf[k], outs[k].at[band], sem_out.at[k]
                )
                for k in range(n_out)
            ]
        for d in outs_dma:
            d.start()
        for d in outs_dma:
            d.wait()

    return kernel, n_in, n_out


def _sublane(itemsize) -> int:
    """Sublane tile for the dtype: DMA row offsets/lengths and in-kernel
    sublane slices must be multiples of this (f32: 8, bf16: 16)."""
    return 16 if itemsize == 2 else 8


def _pick_band(N_pad, M, n_arrays, itemsize, H):
    A = _sublane(itemsize)
    B = 512
    while B > A:
        if B < N_pad and (B + 2 * H) * M * (n_arrays + 2) * itemsize < VMEM_BUDGET_BYTES:
            return B
        B //= 2
    return A


# worst-case operand count / halo across all fused_smooth variants: the
# band layout is computed from these regardless of the actual call variant
# so pre-padded operands (pack_banded) are shared by every variant.
_MAX_ARRAYS = 14  # 9 coefs + b + x0 + 2 planes + e_up
_MAX_H = 8


def band_layout(N, M, itemsize):
    """(B, n_bands, N_total, M_pad) of the band layout for an (N, M) level —
    variant-independent (worst-case VMEM estimate), so one padded copy of a
    loop-invariant operand serves every fused_smooth call on the level."""
    A = _sublane(itemsize)
    M_pad = -(-M // 128) * 128
    B = _pick_band(N + 2 * _MAX_H, M_pad, _MAX_ARRAYS, itemsize, _MAX_H)
    n_bands = -(-N // B)
    return B, n_bands, n_bands * B + 2 * A, M_pad


def band_pad(a, N, M):
    """Pad one operand of an (N, M)-shaped level to the band layout (rows
    [A, A+rows) hold the data; pack_transfer planes may be one row/col
    taller than (N, M) for odd N — the layout always has room)."""
    itemsize = jnp.dtype(a.dtype).itemsize
    A = _sublane(itemsize)
    _, _, N_total, M_pad = band_layout(N, M, itemsize)
    return jnp.pad(a, ((A, N_total - A - a.shape[0]),
                       (0, M_pad - a.shape[1])))


def pack_banded(op, tr_fine=None):
    """Pre-pad the hierarchy-invariant fused_smooth operands (stencil
    coefficients + packed transfer planes) ONCE per hierarchy build.

    Without this, every fused_smooth call re-pads ~9-11 full-size arrays
    (one XLA kernel + a read/write pass of HBM each) before its single
    pallas_call — at 1024^2 that is ~45 MB of copies per smoother call,
    8 calls per V-cycle, ~20 V-cycles per solve. The padded copies are
    loop-invariant, so building them with the hierarchy removes both the
    bandwidth and the per-kernel launch toll of the tunnel's timeable
    windows."""
    N, M = op.aC.shape
    names = ["aC", "aL", "aR", "aB", "aT"]
    if hasattr(op, "aSW"):
        names += ["aSW", "aSE", "aNW", "aNE"]
    # one stacked pad for the (same-shape) coefficient planes: 2 real
    # kernels instead of 9 per level (the views are leading-dim slices of
    # a contiguous buffer — near-free aliases for the pallas HBM refs)
    itemsize = jnp.dtype(op.aC.dtype).itemsize
    A = _sublane(itemsize)
    _, _, N_total, M_pad = band_layout(N, M, itemsize)
    stacked = jnp.pad(jnp.stack([getattr(op, n) for n in names]),
                      ((0, 0), (A, N_total - A - N), (0, M_pad - M)))
    coefs = tuple(stacked[i] for i in range(len(names)))
    planes = (tuple(band_pad(p, N, M) for p in tr_fine)
              if tr_fine is not None else None)
    return coefs, planes


def available(shape, dtype) -> bool:
    """Shape qualifies for the banded kernel (needs >= 2 bands); f32 and
    bf16 are supported (bf16 storage, f32 in-kernel compute — see
    _make_kernel); f64 (emulated on TPU) is rejected — Mosaic has no
    8-byte float."""
    if dtype is not None and jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)
    ):
        return False
    return shape[0] >= 32 and shape[1] >= 2


@functools.partial(jax.jit, static_argnames=("colors", "residual",
                                              "restrict", "interpret",
                                              "padded_io"))
def fused_smooth(op, b, x0=None, colors=(), residual=False, interpret=False,
                 tr_planes=None, restrict=False, ec=None, banded=None,
                 padded_io=False):
    """Run ``colors`` (tuple of bools: True = red half-step) starting from
    ``x0`` (or zero); optionally also return r = b - A x. One HBM pass,
    exactly equivalent to chaining boxmg._rb_sweep color updates.

    With ``tr_planes`` (from pack_transfer): ``restrict=True`` returns
    (x, P^T r) with the restriction fused into the residual epilogue
    (== restrict_box(tr, b - A x)); ``ec`` (coarse error) fuses
    prolongation + correction into the prologue, i.e. the smoothing starts
    from x0 + prolong_box(tr, ec).

    ``banded`` (from pack_banded): pre-padded (coefs, planes) in the band
    layout — skips the per-call jnp.pad of every loop-invariant operand.

    ``padded_io``: ``b`` (and ``x0``) arrive ALREADY in the band-padded
    (N_total, M_pad) layout and the smoothed x is returned in that same
    layout — the padded-carry contract of cg.solve_pcg, which keeps every
    full-size vector in band form across the whole PCG while_loop (no
    per-iteration pad/extract kernels or their HBM copies). Requires
    ``banded``; the secondary output (restricted residual) is still
    returned coarse-raw."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if padded_io:
        assert banded is not None, "padded_io requires pack_banded operands"
        assert not residual, "padded_io: residual variant unused/unsupported"
        N, M = op.aC.shape
    else:
        N, M = b.shape
    dtype = b.dtype
    has_tr = tr_planes is not None
    has_corr = ec is not None
    assert not (restrict or has_corr) or has_tr
    assert not (residual and restrict)
    H = len(colors) + (2 if restrict else 1 if residual else 0) \
        + (1 if has_corr else 0)
    has_x0 = x0 is not None
    is9 = hasattr(op, "aSW")
    ncoef = 9 if is9 else 5

    # pad rows to a whole number of bands and lanes (cols) to a 128 multiple
    # (Mosaic: HBM slice lane dims must be tile-aligned); padded cells carry
    # aC=0 (inert: their updates read b=0 -> x stays 0, matching XLA's
    # zero-fill shifts at the true boundary). The layout is variant-
    # independent (band_layout) so pack_banded operands fit every call.
    itemsize = jnp.dtype(dtype).itemsize
    A = _sublane(itemsize)
    B, n_bands, N_total, M_pad = band_layout(N, M, itemsize)
    # fixed A-row halo on both sides (covers any H <= A) keeps every DMA
    # start and slice length provably tile-aligned for Mosaic; data sits at
    # rows [A, A+N) so every band window is statically rows [kB, kB+B+2A)
    assert H <= A
    W = B + 2 * A

    def pad_rows(a):
        return jnp.pad(a, ((A, N_total - A - a.shape[0]),
                           (0, M_pad - a.shape[1])))
    kernel, n_in, n_out = _make_kernel(
        tuple(colors), residual, has_x0, has_tr, has_corr, restrict,
        ncoef, M_pad, B, H, W, dtype, A,
        padded_out=padded_io, N_total=N_total,
    )

    # explicit HBM: ANY may place small operands in VMEM, where the
    # banded DMA becomes a lane-misaligned VMEM slice Mosaic rejects
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_bands, B, M_pad), dtype) for _ in range(n_out)
    )
    if padded_io:
        out_shapes = ((jax.ShapeDtypeStruct((N_total, M_pad), dtype),)
                      + out_shapes[1:])
    if banded is not None:
        coef_pads, plane_pads = banded
        assert len(coef_pads) == ncoef
        assert coef_pads[0].shape == (N_total, M_pad), (
            coef_pads[0].shape, (N_total, M_pad))
        args = list(coef_pads)
    else:
        coef_arrays = [op.aC, op.aL, op.aR, op.aB, op.aT]
        if is9:
            coef_arrays += [op.aSW, op.aSE, op.aNW, op.aNE]
        args = [pad_rows(a) for a in coef_arrays]
        plane_pads = None
    if padded_io:
        assert b.shape == (N_total, M_pad), (b.shape, (N_total, M_pad))
        args.append(b)
        if has_x0:
            assert x0.shape == (N_total, M_pad), x0.shape
            args.append(x0)
    else:
        args.append(pad_rows(b))
        if has_x0:
            args.append(pad_rows(x0))
    if has_tr:
        args += (list(plane_pads) if plane_pads is not None
                 else [pad_rows(a) for a in tr_planes])
    if has_corr:
        # nearest-neighbor upsample: ec(k+di, l+dj) becomes a ±1 fine shift
        e_up = jnp.repeat(jnp.repeat(ec, 2, axis=0), 2, axis=1)[:N, :M]
        args.append(pad_rows(e_up))

    res = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=out_shapes,
        in_specs=[hbm] * n_in,
        out_specs=tuple([hbm] * n_out),
        scratch_shapes=(
            [pltpu.VMEM((W, M_pad), dtype) for _ in range(n_in)]
            + [pltpu.VMEM((B, M_pad), dtype) for _ in range(n_out)]
            + ([pltpu.VMEM((A, M_pad), dtype)] if padded_io else [])
            + [pltpu.SemaphoreType.DMA((n_in,)),
               pltpu.SemaphoreType.DMA((n_out + (2 if padded_io else 0),))]
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    # band interiors are written pre-aligned: extraction is one reshape
    def extract(bands):
        if padded_io:
            return bands  # already (N_total, M_pad) — the padded contract
        return bands.reshape(n_bands * B, M_pad)[:N, :M]

    if restrict:
        # even-even positions ARE the coarse grid (== restrict_box result).
        # Parity-select via reshape + static index, NOT [0::2, 0::2]:
        # stride-2 slices lower to very slow TPU gathers (measured 43 ms
        # for 17 such slices at 1024^2 — see pallas_rap.fused_rap).
        Nc, Mc = (N + 1) // 2, (M + 1) // 2
        flat = res[1].reshape(n_bands * B, M_pad)
        rows = flat[:2 * Nc].reshape(Nc, 2, M_pad // 2, 2)
        return extract(res[0]), rows[:, 0, :, 0][:, :Mc]
    if residual:
        return extract(res[0]), extract(res[1])
    return extract(res[0])
