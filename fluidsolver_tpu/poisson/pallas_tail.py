"""Pallas TPU kernel: the ENTIRE V-cycle coarse tail in one launch.

Below ~160 cells per side, every remaining multigrid level fits in VMEM at
once, yet the XLA (and even the fused-smoother) path still pays ~13 kernel
launches per level visit — pure launch latency in the tunnel's degraded
windows (10-50 us each) where the arrays themselves are tiny. This kernel
runs the whole tail — pre-smoothing, restriction, ..., coarsest sweeps,
..., prolongation, post-smoothing for EVERY tail level — as ONE
pallas_call.

Representation: "pyramid in place". Level d (d=0 is the tail's finest)
lives at stride-2^d positions of one (Nb, Mb) canvas: the value of level-d
point (a, b) sits at canvas (a<<d, b<<d); all other positions are zero
(an invariant maintained by masked updates). Then
  - a level-d neighbor (a±1) is a static shift by 2^d — Mosaic roll+mask;
  - the level-d red-black mask is bit arithmetic on iota: (i>>d)+(j>>d);
  - restriction output lands naturally on level-(d+1)'s stride-2^(d+1)
    lattice (even level-d points ARE the coarse points) — no compaction;
  - prolongation reads the dilated coarse error with shifts of 2^d — no
    lane expansion.
The per-point arithmetic mirrors boxmg._rb_sweep / restrict_box /
prolong_box exactly; zero coefficients at inactive positions make
out-of-level reads contribute exactly the zero-fill the level-edge
semantics require. The canvas is sized so every level's packed-transfer
overhang row/col (pack_transfer returns (2Nc, 2Mc) planes; for odd levels
the pN family carries real entries one row past the level) fits after
dilation.

The coarsest tail level runs boxmg.COARSE_SWEEPS symmetric red-black
sweeps via an in-kernel fori_loop (launch-free) instead of boxmg's dense
direct inverse — applying a dense inverse needs the RHS compacted to a
vector, which Mosaic cannot do from a dilated layout. The cycle stays a
symmetric preconditioner; this was the shipped configuration before the
direct solve existed (see boxmg.COARSE_SWEEPS/DIRECT_COARSEST notes).

Replaces: the per-level recursion of boxmg.v_cycle on small levels (same
role as the coarse hierarchy of HYPRE PFMG,
src/LinearSolver_StructHypre.hpp:217-237).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from fluidsolver_tpu.core.fields import register_pytree_dataclass

VMEM_BUDGET_BYTES = 9 * 1024 * 1024
MAX_TAIL_LEVELS = 6
MAX_TAIL_SIDE = 160


@register_pytree_dataclass
@dataclasses.dataclass
class TailPack:
    """Dilated tail-level data, all canvas-shaped (Nb, Mb).

    coefs: tuple over levels of 9-tuples (aC..aNE, boxmg.Stencil9 order;
           5-point levels carry zero corner planes).
    planes: tuple over non-last levels of (planeU, planeV) — the
           pack_transfer parity planes, dilated by the level stride.
    """

    coefs: tuple
    planes: tuple


def _level_shapes(shape, n_levels):
    shapes = [shape]
    for _ in range(n_levels - 1):
        n, m = shapes[-1]
        shapes.append(((n + 1) // 2, (m + 1) // 2))
    return shapes


def canvas_shape(shape, n_levels):
    """Smallest (8-, 128-aligned) canvas holding every dilated level
    INCLUDING the packed-transfer overhang (2Nc per level)."""
    shapes = _level_shapes(shape, n_levels)
    rows = shape[0]
    cols = shape[1]
    for d in range(n_levels - 1):
        nd, md = shapes[d]
        rows = max(rows, 2 * ((nd + 1) // 2) * (1 << d))
        cols = max(cols, 2 * ((md + 1) // 2) * (1 << d))
    return (-(-rows // 8) * 8, -(-cols // 128) * 128)


def available_shape(shape, n_levels, dtype, ignore_dtype=False) -> bool:
    """Shape-only tail gate: ``n_levels`` levels from ``shape`` down fit
    one canvas in VMEM. Usable BEFORE the levels exist (the fused-setup
    build stop, boxmg.build_hierarchy)."""
    if not ignore_dtype and jnp.dtype(dtype) != jnp.float32:
        return False  # f64 is emulated on TPU; Mosaic rejects it
    d = n_levels
    if max(shape) > MAX_TAIL_SIDE or d > MAX_TAIL_LEVELS or d < 2:
        return False
    nb, mb = canvas_shape(shape, d)
    itemsize = jnp.dtype(dtype).itemsize
    # resident: 9d coef + 2(d-1) transfer inputs; live during recursion:
    # x and b per level on the stack (~2d) plus working temporaries
    n_planes = 9 * d + 2 * (d - 1) + 2 * d + 8
    return nb * mb * n_planes * itemsize < VMEM_BUDGET_BYTES


def available(levels, lvl, ignore_dtype=False) -> bool:
    """Tail qualifies: every level from lvl down fits one canvas in VMEM.

    ``ignore_dtype``: skip the f64 gate — for interpret-mode tests, which
    deliberately run in f64 for tight equivalence tolerances."""
    op = levels[lvl].op
    return available_shape(op.aC.shape, len(levels) - lvl, op.aC.dtype,
                           ignore_dtype=ignore_dtype)


def _dilate(arr, stride, cs):
    """arr[..., k, l] -> canvas[..., k*stride, l*stride], zeros elsewhere
    (leading batch dims pass through). Built as block-pad + reshape, NOT a
    strided scatter: stride-s index updates lower to very slow TPU
    gathers/scatters (the stride-2 parity slices they mirror measured
    43 ms/level at 1024^2 — see pallas_rap)."""
    *lead, n, m = arr.shape
    lead = tuple(lead)
    zpad = [(0, 0)] * len(lead)
    if stride == 1:
        return jnp.pad(arr, zpad + [(0, cs[0] - n), (0, cs[1] - m)])
    blk = jnp.pad(arr[..., :, None, :, None],
                  zpad + [(0, 0), (0, stride - 1), (0, 0), (0, stride - 1)])
    dil = blk.reshape(lead + (n * stride, m * stride))[..., :cs[0], :cs[1]]
    return jnp.pad(dil, zpad + [(0, cs[0] - dil.shape[-2]),
                                (0, cs[1] - dil.shape[-1])])


def build_tail_pack(levels, lvl) -> TailPack:
    """Dilate levels[lvl:] onto the canvas (build-time XLA, once per
    hierarchy)."""
    from fluidsolver_tpu.poisson import pallas_vcycle as pv
    from fluidsolver_tpu.poisson.boxmg import Stencil9

    n_levels = len(levels) - lvl
    cs = canvas_shape(levels[lvl].op.aC.shape, n_levels)
    coefs, planes = [], []
    for d, level in enumerate(levels[lvl:]):
        op = level.op
        stride = 1 << d
        names = ["aC", "aL", "aR", "aB", "aT"]
        if isinstance(op, Stencil9):
            names += ["aSW", "aSE", "aNW", "aNE"]
        # ONE batched dilate per level (stack + block-pad + reshape on a
        # leading axis) instead of 9 per level — the per-plane form was
        # ~50 tiny launches per tail build (round-4 step census)
        dil = _dilate(jnp.stack([getattr(op, n) for n in names]), stride, cs)
        cc = [dil[i] for i in range(len(names))]
        if len(names) == 5:
            cc += [jnp.zeros(cs, op.aC.dtype)] * 4
        coefs.append(tuple(cc))
        if d < n_levels - 1:
            if level.tr_fine is not None:
                pU, pV = level.tr_fine
            else:
                pU, pV = pv.pack_transfer(level.tr, op.aC.shape)
            pd = _dilate(jnp.stack([pU, pV]), stride, cs)
            planes.append((pd[0], pd[1]))
    return TailPack(coefs=tuple(coefs), planes=tuple(planes))


# zero-fill masked shift — single definition in pallas_vcycle
from fluidsolver_tpu.poisson.pallas_vcycle import _shift_in as _sh  # noqa: E402


# ---- shared in-kernel stencil algebra (cycle AND setup kernels) ----------
# The dilated-canvas forms of boxmg.apply_any / restrict_box / prolong_box;
# formulas unchanged from the validated cycle kernel, lifted to module
# scope so the setup kernel (build_tail_pack_fused) reuses them verbatim.

def _k_apply_op(cc, x, s):
    aC, aL, aR, aB, aT, aSW, aSE, aNW, aNE = cc
    return (
        aC * x
        + aL * _sh(x, -s, 0) + aR * _sh(x, s, 0)
        + aB * _sh(x, 0, -s) + aT * _sh(x, 0, s)
        + aSW * _sh(x, -s, -s) + aSE * _sh(x, s, -s)
        + aNW * _sh(x, -s, s) + aNE * _sh(x, s, s)
    )


def _k_restrict(planes_d, r, s):
    # P^T r in dilated form (term order = boxmg.restrict_box); the result
    # is consumed on the coarse lattice only
    pU, pV = planes_d
    P1 = pU * r
    P2 = pV * r
    return (
        r
        + _sh(P1, s, 0)
        + _sh(_sh(pU, -s, 0) * r, -s, 0)
        + _sh(P1, 0, s)
        + _sh(_sh(pU, s, 0) * r, 0, -s)
        + _sh(P2, s, s)
        + _sh(_sh(pV, -s, 0) * r, -s, s)
        + _sh(_sh(pV, 0, -s) * r, s, -s)
        + _sh(_sh(pV, -s, -s) * r, -s, -s)
    )


def _k_prolong(planes_d, ec, s, oi, oj):
    # P ec in dilated form (term order = boxmg.prolong_box). At every
    # active level-d position exactly one of the four shifts of the
    # dilated ec is its coarse parent ec(a//2, b//2).
    pU, pV = planes_d
    e = ec + _sh(ec, -s, 0) + _sh(ec, 0, -s) + _sh(ec, -s, -s)
    corr_oe = pU * _sh(e, -s, 0) + _sh(pU, -s, 0) * _sh(e, s, 0)
    corr_eo = pU * _sh(e, 0, -s) + _sh(pU, s, 0) * _sh(e, 0, s)
    corr_oo = (
        pV * _sh(e, -s, -s) + _sh(pV, -s, 0) * _sh(e, s, -s)
        + _sh(pV, 0, -s) * _sh(e, -s, s)
        + _sh(pV, -s, -s) * _sh(e, s, s)
    )
    return jnp.where(
        oi, jnp.where(oj, corr_oo, corr_oe),
        jnp.where(oj, corr_eo, e),
    )


def _make_kernel(n_levels, colors_pre, colors_post, coarse_pairs, cs, dtype):
    Nb, Mb = cs

    def kernel(*refs):
        # refs: b, 9 coefs per level, 2 planes per non-last level, out x
        b0 = refs[0][:]
        coefs = [tuple(refs[1 + 9 * d + k][:] for k in range(9))
                 for d in range(n_levels)]
        pbase = 1 + 9 * n_levels
        planes = [(refs[pbase + 2 * d][:], refs[pbase + 2 * d + 1][:])
                  for d in range(n_levels - 1)]
        out_x = refs[pbase + 2 * (n_levels - 1)]

        ii = jax.lax.broadcasted_iota(jnp.int32, (Nb, Mb), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (Nb, Mb), 1)

        def level_masks(d):
            active = ((ii & ((1 << d) - 1)) == 0) & \
                     ((jj & ((1 << d) - 1)) == 0)
            red = ((((ii >> d) + (jj >> d)) & 1) == 0)
            return active, red

        apply_op = _k_apply_op

        def sweep(cc, x, b, d, want_red, active, red):
            s = 1 << d
            aC = cc[0]
            aC_safe = jnp.where(aC == 0.0, 1.0, aC)
            ax_off = apply_op(cc, x, s) - aC * x
            x_new = (b - ax_off) / aC_safe
            mask = active & (red if want_red else ~red)
            return jnp.where(mask, x_new, x)

        def restrict(d, r):
            return _k_restrict(planes[d], r, 1 << d)

        def prolong_add(d, x, ec, active):
            oi = ((ii >> d) & 1) == 1
            oj = ((jj >> d) & 1) == 1
            corr = _k_prolong(planes[d], ec, 1 << d, oi, oj)
            return x + jnp.where(active, corr, 0.0)

        def cycle(d, b):
            active, red = level_masks(d)
            cc = coefs[d]
            x = jnp.zeros((Nb, Mb), dtype)
            if d == n_levels - 1:
                # symmetric forward+reverse sweep pairs, launch-free
                def pair(_, x):
                    x = sweep(cc, x, b, d, True, active, red)
                    x = sweep(cc, x, b, d, False, active, red)
                    x = sweep(cc, x, b, d, False, active, red)
                    return sweep(cc, x, b, d, True, active, red)

                return jax.lax.fori_loop(0, coarse_pairs, pair, x)
            for want_red in colors_pre:
                x = sweep(cc, x, b, d, want_red, active, red)
            s = 1 << d
            r = jnp.where(active, b - apply_op(cc, x, s), 0.0)
            active_c, _ = level_masks(d + 1)
            bc = jnp.where(active_c, restrict(d, r), 0.0)
            ec = cycle(d + 1, bc)
            x = prolong_add(d, x, ec, active)
            for want_red in colors_post:
                x = sweep(cc, x, b, d, want_red, active, red)
            return x

        out_x[:] = cycle(0, b0)

    return kernel


# ---- one-launch tail SETUP ------------------------------------------------

def _make_setup_kernel(n_levels, shapes, cs, dtype):
    """Kernel body for build_tail_pack_fused: starting from the tail-finest
    9-plane operator (dilated at stride 1), build every coarser level's
    operator and packed transfer planes without leaving VMEM."""
    Nb, Mb = cs

    def kernel(*refs):
        ins = refs[:9]
        outs = refs[9:]
        ii = jax.lax.broadcasted_iota(jnp.int32, (Nb, Mb), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (Nb, Mb), 1)

        def act(d_):
            m = (1 << d_) - 1
            return ((ii & m) == 0) & ((jj & m) == 0)

        def safe(x):
            return jnp.where(x == 0.0, 1.0, x)

        cc = tuple(r[:] for r in ins)
        for d in range(n_levels - 1):
            s = 1 << d
            aC, aL, aR, aB, aT, aSW, aSE, aNW, aNE = cc
            # -- operator-collapsed weights (boxmg.collapse_weights, dilated:
            # identical formulas and FP order; neighbor samples at ±1 level-d
            # index are canvas shifts by s) --
            den_x = safe(aC + aT + aB)
            den_y = safe(aC + aL + aR)
            pWf = -(aL + aNW + aSW) / den_x
            pEf = -(aR + aNE + aSE) / den_x
            pSf = -(aB + aSW + aSE) / den_y
            pNf = -(aT + aNW + aNE) / den_y
            cden = safe(aC)
            vSW = aSW + aL * _sh(pSf, -s, 0) + aB * _sh(pWf, 0, -s)
            vSE = aSE + aR * _sh(pSf, s, 0) + aB * _sh(pEf, 0, -s)
            vNW = aNW + aL * _sh(pNf, -s, 0) + aT * _sh(pWf, 0, s)
            vNE = aNE + aR * _sh(pNf, s, 0) + aT * _sh(pEf, 0, s)
            cSW, cSE = -vSW / cden, -vSE / cden
            cNW, cNE = -vNW / cden, -vNE / cden
            # -- pack to the pallas_vcycle.pack_transfer parity layout:
            # fine (2k+p, 2l+q) holds {pE,pS,pW,pN}/{pNE,pSE,pNW,pSW} of
            # coarse (k,l); the line weights live AT their defining fine
            # position, the rest are one-step shifts --
            oi = ((ii >> d) & 1) == 1
            oj = ((jj >> d) & 1) == 1
            actd = act(d)
            pU = jnp.where(
                actd,
                jnp.where(oi, jnp.where(oj, _sh(pNf, -s, 0), pWf),
                          jnp.where(oj, pSf, _sh(pEf, s, 0))),
                0.0)
            pV = jnp.where(
                actd,
                jnp.where(oi, jnp.where(oj, cSW, _sh(cNW, 0, s)),
                          jnp.where(oj, _sh(cSE, s, 0), _sh(cNE, s, s))),
                0.0)
            planes_d = (pU, pV)
            # -- Galerkin coarse operator by comb probing (boxmg.
            # galerkin_boxmg on the canvas): nine period-3 combs through
            # P^T A P; prolong/apply/restrict are the cycle kernel's own
            # dilated forms, so the product lands directly at stride-2^(d+1)
            # positions — no parity unpack exists at all --
            sc2 = d + 1
            Kc = ii >> sc2
            Lc = jj >> sc2
            actc = act(d + 1)
            one = jnp.asarray(1.0, dtype)
            zero = jnp.asarray(0.0, dtype)
            Ys = []
            for pa in range(3):
                for pb in range(3):
                    comb = jnp.where(
                        actc & ((Kc % 3) == pa) & ((Lc % 3) == pb), one, zero)
                    e = jnp.where(actd, _k_prolong(planes_d, comb, s, oi, oj),
                                  0.0)
                    y = jnp.where(actd, _k_apply_op(cc, e, s), 0.0)
                    Ys.append(jnp.where(actc, _k_restrict(planes_d, y, s),
                                        0.0))
            Nc1, Mc1 = shapes[d + 1]
            new_cc = []
            for (dI, dJ) in ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
                             (-1, -1), (1, -1), (-1, 1), (1, 1)):
                acc = jnp.zeros((Nb, Mb), dtype)
                for pa in range(3):
                    for pb in range(3):
                        m = ((((Kc + dI) % 3) == pa)
                             & (((Lc + dJ) % 3) == pb))
                        acc = acc + jnp.where(m, Ys[3 * pa + pb], 0.0)
                valid = ((Kc + dI >= 0) & (Kc + dI < Nc1)
                         & (Lc + dJ >= 0) & (Lc + dJ < Mc1))
                new_cc.append(jnp.where(actc & valid, acc, 0.0))
            base = 11 * d
            outs[base][:] = pU
            outs[base + 1][:] = pV
            for k in range(9):
                outs[base + 2 + k][:] = new_cc[k]
            cc = tuple(new_cc)

    return kernel


def build_tail_pack_fused(op0, n_levels: int, interpret=False) -> TailPack:
    """ONE-launch tail setup: from the tail-finest operator ``op0`` build
    EVERY coarser tail level's 9-point Galerkin operator and packed
    transfer planes in a single pallas_call, replacing the per-level XLA
    setup chains of build_hierarchy below the tail (~25 fusions/level —
    the round-5 hierarchy lever, PERF.md "one-launch tail SETUP"; same
    role as the PFMG coarse-level setup,
    src/LinearSolver_StructHypre.hpp:217-237).

    Numerics: transfer weights are the collapse_weights formulas in the
    same FP order (bit-exact); coarse operators are the Galerkin product
    via comb probing (boxmg.galerkin_boxmg's documented equivalence with
    galerkin_closed — equal to rounding, compounding per level).
    Returns a TailPack whose coefs[0] is ``op0`` dilated (stride 1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluidsolver_tpu.poisson.boxmg import Stencil9

    shape = op0.aC.shape
    shapes = _level_shapes(shape, n_levels)
    cs = canvas_shape(shape, n_levels)
    dtype = op0.aC.dtype
    names = ["aC", "aL", "aR", "aB", "aT"]
    if isinstance(op0, Stencil9):
        names += ["aSW", "aSE", "aNW", "aNE"]
    dil = _dilate(jnp.stack([getattr(op0, n) for n in names]), 1, cs)
    args = [dil[i] for i in range(len(names))]
    if len(names) == 5:
        args += [jnp.zeros(cs, dtype)] * 4
    kernel = _make_setup_kernel(n_levels, tuple(shapes), cs, dtype)
    n_out = 11 * (n_levels - 1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(cs, dtype)] * n_out,
        in_specs=[vmem] * 9,
        out_specs=[vmem] * n_out,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    coefs = [tuple(args)]
    planes = []
    for d in range(n_levels - 1):
        base = 11 * d
        planes.append((outs[base], outs[base + 1]))
        coefs.append(tuple(outs[base + 2:base + 11]))
    return TailPack(coefs=tuple(coefs), planes=tuple(planes))


@functools.partial(jax.jit, static_argnames=("n_pre", "n_post", "interpret"))
def tail_cycle(pack: TailPack, b, n_pre=1, n_post=1, interpret=False):
    """One V(n_pre, n_post) cycle over the whole tail; ``b`` is the tail's
    finest-level RHS (true shape, undilated). Returns x of the same shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluidsolver_tpu.poisson.boxmg import COARSE_SWEEPS

    N, M = b.shape
    n_levels = len(pack.coefs)
    dtype = b.dtype
    cs = pack.coefs[0][0].shape
    b_pad = jnp.pad(b, ((0, cs[0] - N), (0, cs[1] - M)))

    args = [b_pad]
    for cc in pack.coefs:
        args.extend(cc)
    for pU, pV in pack.planes:
        args.extend([pU, pV])

    # one "pair" below = forward + reverse sweep (4 color updates) == one
    # iteration of boxmg's COARSE_SWEEPS // 2 fori_loop
    kernel = _make_kernel(
        n_levels, (True, False) * n_pre, (False, True) * n_post,
        COARSE_SWEEPS // 2, cs, dtype,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cs, dtype),
        in_specs=[vmem] * len(args),
        out_specs=vmem,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return x[:N, :M]
