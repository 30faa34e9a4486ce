"""Pallas TPU kernel: fused BoxMG setup (weights + Galerkin RAP) per level.

One hierarchy build compiles to ~700 XLA fusions (measured on the 512^2
5-point operator: ~100-136 per level), i.e. ~3500 kernel launches per step
at refresh="solve". In healthy tunnel windows launches are ~100 ns and this
is invisible; in the degraded/timeable windows the axon tunnel sits in for
hours (CLAUDE.md), each launch costs 10-50 us and setup alone is tens of ms
per step. This kernel fuses one level's ENTIRE setup — the operator-
collapsed interpolation weights (boxmg.collapse_weights) plus the closed-
form Galerkin product (boxmg.galerkin_closed) — into ONE banded pallas_call
(~20 launches/level including the XLA unpack slices).

Method: everything is computed in FINE-grid space. The weight fields
(pW_full, vSW/cden, ...) are already fine-space formulas in
collapse_weights; each RAP term  w1[K+g1,L+d1] * a[2K+α,2L+β] *
w2[K+g2,L+d2]  becomes, at fine base (i,j) = (2K,2L), a product of three
STATICALLY SHIFTED fine-space planes (weight entries at coarse (K+g,L+d)
live at fine (2K+2g+p, 2L+2d+q) where (p,q) is the weight's natural
parity). Values at odd-parity base points are meaningless and discarded by
the parity unpack. Shifts are pure ``pltpu.roll`` with NO masks: the
wrapper zero-pads 8 rows/lanes on every side, so wrapped-around values land
in (and only ever come from) halo/pad rings that no consumed value reads
(max read depth from a consumed row: placement 1 + weight-shift 3 + coef
1 = 5 < 8).

Outputs are parity-PACKED: the 8 weight planes sit at their natural fine
parities and the 9 coarse-stencil planes fill the remaining slots (shifted
by their slot parity), so the kernel writes 5 fine-shaped planes instead of
17. The wrapper unpacks with strided slices and applies the same _pad_to /
valid-coupling masks as the XLA path. Result is arithmetically identical
term-for-term to (collapse_weights, galerkin_closed) — tests assert
equality in interpret mode on CPU.

Replaces (when FS_PALLAS_RAP=1, TPU, single device): the XLA lowering of
boxmg.collapse_weights + boxmg.galerkin_closed. Same role as HYPRE's PFMG
setup phase (reference: src/LinearSolver_StructHypre.hpp:217-237).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VMEM_BUDGET_BYTES = 9 * 1024 * 1024
PAD = 8  # zero halo on every side; max consumed read depth is 5

# natural fine parity of each interpolation-weight family:
#   pW/pE live at fine (2k+1, 2l), pS/pN at (2k, 2l+1), corners at odd-odd
_W_PARITY = {
    "pW": (1, 0), "pE": (1, 0),
    "pS": (0, 1), "pN": (0, 1),
    "pSW": (1, 1), "pSE": (1, 1), "pNW": (1, 1), "pNE": (1, 1),
}

# packed-plane slot assignment: (plane, p, q) per output. Weights keep
# their natural parity (stored unshifted); coarse coefficients take the
# remaining slots (stored shifted by (p, q) so coarse (k,l) lives at fine
# (2k+p, 2l+q)).
_SLOTS = {
    "aC": (0, 0, 0), "pW": (0, 1, 0), "pS": (0, 0, 1), "pSW": (0, 1, 1),
    "aL": (1, 0, 0), "pE": (1, 1, 0), "pN": (1, 0, 1), "pSE": (1, 1, 1),
    "aR": (2, 0, 0), "aB": (2, 1, 0), "aT": (2, 0, 1), "pNW": (2, 1, 1),
    "aSW": (3, 0, 0), "aSE": (3, 1, 0), "aNW": (3, 0, 1), "pNE": (3, 1, 1),
    "aNE": (4, 0, 0),
}
N_PLANES = 5
_W_NAMES = ("pW", "pE", "pS", "pN", "pSW", "pSE", "pNW", "pNE")
# canonical coarse-offset order (matches boxmg.Stencil9 field order)
_C_ORDER = ("aC", "aL", "aR", "aB", "aT", "aSW", "aSE", "aNW", "aNE")


def _sh(x, di, dj):
    """x[i+di, j+dj] via pure rolls (valid under the PAD-ring invariant)."""
    from jax.experimental.pallas import tpu as pltpu

    n, m = x.shape
    if di:
        x = pltpu.roll(x, (-di) % n, 0)
    if dj:
        x = pltpu.roll(x, (-dj) % m, 1)
    return x


def _safe(d):
    return jnp.where(d == 0.0, 1.0, d)


def _packed_transfer_from_canvas(planes, Nc, Mc, dtype):
    """(planeU, planeV) == pallas_vcycle.pack_transfer(tr, ...) rebuilt
    straight from the extracted canvas planes: the canvas already stores
    every weight at its fine-space parity position (_SLOTS), so each
    packed plane is one masked select of (±1-shifted) canvas crops —
    bit-identical values, ~2 fusions instead of 8 slot unpacks + 12
    interleave reshapes per level at hierarchy-build time."""
    rows, cols = 2 * Nc, 2 * Mc

    def crop(p, dr, dc):
        # value at target (i, j) = p[i + dr, PAD + j + dc]
        a = p[dr:dr + rows, PAD + dc:PAD + dc + cols]
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    ii = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) % 2
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) % 2
    p0 = crop(planes[0], 0, 0)
    # planeU = interleave(pE, pS, pW, pN); slots: pE=(1,1,0), pS=(0,0,1),
    # pW=(0,1,0), pN=(1,0,1)
    p1_dn = crop(planes[1], 1, 0)
    p1_up = jnp.pad(crop(planes[1], 0, 0)[:-1], ((1, 0), (0, 0)))
    planeU = jnp.where((ii == 0) & (jj == 0), p1_dn,
                       jnp.where((ii == 1) & (jj == 1), p1_up, p0))
    # planeV = interleave(pNE, pSE, pNW, pSW); slots: pNE=(3,1,1),
    # pSE=(1,1,1), pNW=(2,1,1), pSW=(0,1,1)
    planeV = jnp.where(
        (ii == 0) & (jj == 0), crop(planes[3], 1, 1),
        jnp.where((ii == 0) & (jj == 1), crop(planes[1], 1, 0),
                  jnp.where((ii == 1) & (jj == 0), crop(planes[2], 0, 1),
                            p0)))
    return planeU.astype(dtype), planeV.astype(dtype)


def _make_kernel(ncoef, B, W, M_total, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluidsolver_tpu.poisson.boxmg import _OFF_NAME, _enumerate_rap_terms

    terms = _enumerate_rap_terms(ncoef)

    def kernel(*refs):
        ins = refs[:ncoef]
        outs = refs[ncoef:ncoef + N_PLANES]
        scratch = refs[ncoef + N_PLANES:ncoef + N_PLANES + ncoef]
        out_buf = refs[ncoef + N_PLANES + ncoef:
                       ncoef + N_PLANES + ncoef + N_PLANES]
        sem_in, sem_out = refs[-2], refs[-1]

        band = pl.program_id(0)
        start = pl.multiple_of(band * B, 8)

        dmas = [
            pltpu.make_async_copy(
                ins[i].at[pl.ds(start, W), :], scratch[i], sem_in.at[i]
            )
            for i in range(ncoef)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        planes = {"aC": scratch[0][:], "aL": scratch[1][:],
                  "aR": scratch[2][:], "aB": scratch[3][:],
                  "aT": scratch[4][:]}
        if ncoef == 9:
            planes.update({"aSW": scratch[5][:], "aSE": scratch[6][:],
                           "aNW": scratch[7][:], "aNE": scratch[8][:]})
        c, w, e = planes["aC"], planes["aL"], planes["aR"]
        s, n = planes["aB"], planes["aT"]
        if ncoef == 9:
            asw, ase = planes["aSW"], planes["aSE"]
            anw, ane = planes["aNW"], planes["aNE"]
        else:
            asw = ase = anw = ane = jnp.zeros((), dtype)

        # fine-space weight fields — same formulas as collapse_weights
        # (boxmg.py), evaluated at every fine point
        pW_f = -(w + anw + asw) / _safe(c + n + s)
        pE_f = -(e + ane + ase) / _safe(c + n + s)
        pS_f = -(s + asw + ase) / _safe(c + w + e)
        pN_f = -(n + anw + ane) / _safe(c + w + e)
        cden = _safe(c)
        vSW = asw + w * _sh(pS_f, -1, 0) + s * _sh(pW_f, 0, -1)
        vSE = ase + e * _sh(pS_f, +1, 0) + s * _sh(pE_f, 0, -1)
        vNW = anw + w * _sh(pN_f, -1, 0) + n * _sh(pW_f, 0, +1)
        vNE = ane + e * _sh(pN_f, +1, 0) + n * _sh(pE_f, 0, +1)
        wfields = {
            "pW": pW_f, "pE": pE_f, "pS": pS_f, "pN": pN_f,
            "pSW": -vSW / cden, "pSE": -vSE / cden,
            "pNW": -vNW / cden, "pNE": -vNE / cden,
        }

        # absolute parity masks (start is a multiple of 8 -> even, so
        # window-local row parity equals absolute parity; lanes untiled)
        ii = jax.lax.broadcasted_iota(jnp.int32, (W, M_total), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (W, M_total), 1)
        par = {(p, q): ((ii % 2) == p) & ((jj % 2) == q)
               for p in (0, 1) for q in (0, 1)}

        def w_at(name, g, d):
            p, q = _W_PARITY[name]
            return _sh(wfields[name], 2 * g + p, 2 * d + q)

        packed = [jnp.zeros((W, M_total), dtype) for _ in range(N_PLANES)]

        # Galerkin product, term order identical to galerkin_closed
        for DK, DL in [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
                       (-1, -1), (1, -1), (-1, 1), (1, 1)]:
            acc = jnp.zeros((W, M_total), dtype)
            for (w1, g1, d1, a_name, alpha, beta, w2, g2, d2) in terms[(DK, DL)]:
                v = _sh(planes[a_name], alpha, beta)
                if w1 != "one":
                    v = v * w_at(w1, g1, d1)
                if w2 != "one":
                    v = v * w_at(w2, g2, d2)
                acc = acc + v
            plane, p, q = _SLOTS[_OFF_NAME[(DK, DL)]]
            placed = _sh(acc, -p, -q) if (p or q) else acc
            packed[plane] = jnp.where(par[(p, q)], placed, packed[plane])

        for name in _W_NAMES:
            plane, p, q = _SLOTS[name]
            packed[plane] = jnp.where(par[(p, q)], wfields[name],
                                      packed[plane])

        for k in range(N_PLANES):
            out_buf[k][:] = packed[k]
        outs_dma = [
            pltpu.make_async_copy(out_buf[k], outs[k].at[band], sem_out.at[k])
            for k in range(N_PLANES)
        ]
        for d in outs_dma:
            d.start()
        for d in outs_dma:
            d.wait()

    return kernel


def _pick_band(M_total, ncoef, itemsize):
    # live VMEM planes: ncoef inputs + 8 weight fields + 5 out buffers +
    # ~6 temporaries in flight
    n_planes = ncoef + 8 + N_PLANES + 6
    B = 256
    while B > 8:
        if (B + 2 * PAD) * M_total * n_planes * itemsize < VMEM_BUDGET_BYTES:
            return B
        B //= 2
    return 8


def available(shape, dtype) -> bool:
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False  # f64 is emulated on TPU; Mosaic rejects it
    return shape[0] >= 8 and shape[1] >= 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_rap(op, interpret=False):
    """(BoxTransfer, Stencil9) for one level, arithmetically identical to
    (collapse_weights(op), galerkin_closed(op, tr, shape))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluidsolver_tpu.poisson.boxmg import BoxTransfer, Stencil9

    is9 = isinstance(op, Stencil9)
    ncoef = 9 if is9 else 5
    N, M = op.aC.shape
    Nc, Mc = (N + 1) // 2, (M + 1) // 2
    dtype = op.aC.dtype

    # lanes: data at [PAD, PAD+M), zero elsewhere; >= PAD zeros on the right
    M_total = -(-(M + 2 * PAD) // 128) * 128
    B = _pick_band(M_total, ncoef, jnp.dtype(dtype).itemsize)
    n_bands = -(-N // B)
    # rows: data at [PAD, PAD+N); window k = rows [kB, kB + B + 2*PAD)
    W = B + 2 * PAD
    N_total = n_bands * B + 2 * PAD

    def pad(a):
        return jnp.pad(a, ((PAD, N_total - N - PAD), (PAD, M_total - M - PAD)))

    coef_arrays = [op.aC, op.aL, op.aR, op.aB, op.aT]
    if is9:
        coef_arrays += [op.aSW, op.aSE, op.aNW, op.aNE]
    args = [pad(a) for a in coef_arrays]

    kernel = _make_kernel(ncoef, B, W, M_total, dtype)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    res = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_bands, W, M_total), dtype)
            for _ in range(N_PLANES)
        ),
        in_specs=[hbm] * ncoef,
        out_specs=tuple([hbm] * N_PLANES),
        scratch_shapes=(
            [pltpu.VMEM((W, M_total), dtype) for _ in range(ncoef + N_PLANES)]
            + [pltpu.SemaphoreType.DMA((ncoef,)),
               pltpu.SemaphoreType.DMA((N_PLANES,))]
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    # reassemble fine-space packed planes: band interiors + 2 extra rows
    # from the last band (odd-parity slots of coarse row Nc-1 can land on
    # data rows N / N+1). Band interiors are contiguous in the canvas, so
    # the body is one slice + reshape (not n_bands slices + concat).
    def extract(canvas):
        body = canvas[:, PAD:PAD + B].reshape(n_bands * B, M_total)
        tail = canvas[n_bands - 1, PAD + B:PAD + B + 2]
        return jnp.concatenate([body, tail], axis=0)[:N + 2]

    planes = [extract(res[k]) for k in range(N_PLANES)]

    # BATCHED parity unpack: one stack + one transpose + one crop produce
    # ALL 20 (plane, p, q) slots as free leading-dim views — instead of
    # ~2 layout ops per slot (the round-3 form: 17 reshft slices + pads,
    # ~30 real kernels/level of the hierarchy's launch budget). The naive
    # a[p::2, PAD+q::2] stride-2 slices remain catastrophically slow TPU
    # gathers (43 ms/level measured) — never reintroduce them. PAD is
    # even, so column parity over the full lane span equals q.
    assert PAD % 2 == 0
    R = (N + 2 + 1) // 2
    M2 = M_total // 2

    stack5 = jnp.stack(planes)                       # (5, N+2, M_total)
    stack5 = jnp.pad(stack5, ((0, 0), (0, 2 * R - (N + 2)), (0, 0)))
    t20 = (stack5.reshape(N_PLANES, R, 2, M2, 2)
           .transpose(0, 2, 4, 1, 3)
           .reshape(N_PLANES * 4, R, M2))
    # one batched crop to (Nc, Mc); R >= Nc and M2 >= PAD//2 + Mc always
    t20 = t20[:, :Nc, PAD // 2:PAD // 2 + Mc]

    def slot(name):
        plane, p, q = _SLOTS[name]
        return t20[plane * 4 + p * 2 + q]

    tr = BoxTransfer(**{name: slot(name) for name in _W_NAMES})

    from jax import lax
    from fluidsolver_tpu.poisson.boxmg import _A_OFFSETS

    # coarse coefficients: batched validity mask (out-of-grid neighbor
    # offsets zeroed) over one stacked where
    idx9 = jnp.asarray([_SLOTS[n][0] * 4 + _SLOTS[n][1] * 2 + _SLOTS[n][2]
                        for n in _C_ORDER], jnp.int32)
    offs = jnp.asarray([_A_OFFSETS[n] for n in _C_ORDER], jnp.int32)
    I = lax.broadcasted_iota(jnp.int32, (1, Nc, Mc), 1)
    J = lax.broadcasted_iota(jnp.int32, (1, Nc, Mc), 2)
    IK = I + offs[:, 0][:, None, None]
    JL = J + offs[:, 1][:, None, None]
    valid = (IK >= 0) & (IK < Nc) & (JL >= 0) & (JL < Mc)
    coarse9 = jnp.where(valid, t20[idx9], 0.0)
    coarse = Stencil9(**{n: coarse9[i] for i, n in enumerate(_C_ORDER)})

    # packed transfer planes straight from the canvas (the values already
    # sit at fine-space parity positions): planeU/planeV == the
    # pallas_vcycle.pack_transfer interleave of the unpacked weights,
    # rebuilt here as ONE masked-select fusion each instead of 8 slot
    # unpacks + 12 interleave reshapes at hierarchy-build time.
    packed = _packed_transfer_from_canvas(planes, Nc, Mc, dtype)
    return tr, coarse, packed
