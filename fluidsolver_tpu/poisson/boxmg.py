"""BoxMG: operator-dependent blackbox multigrid (Dendy 1982, JCP 48).

The PC-Galerkin V-cycle in ``poisson/mg.py`` replaces HYPRE PFMG iteration-
for-iteration, but its convergence factor (~0.5) is capped by the piecewise-
constant transfers (see mg.v_cycle docstring: the measured fix — smoothed
transfers with exact Galerkin — explodes the coarse-stencil footprint under
cell AGGREGATION coarsening). BoxMG sidesteps that: coarse unknowns are the
even-index subset of the cell-center graph (vertex-style coarsening on the
index set — the preconditioner is pure algebra, nothing requires coarse
points to sit at coarse-cell centroids), the interpolation collapses the
actual operator rows (so it is exact across 1000:1 density jumps where
bilinear interpolates wrongly), restriction is the exact transpose, and the
Galerkin product R A P stays a 9-POINT stencil closed under recursion —
representable matrix-free as nine coefficient arrays.

Measured (numpy prototype, 1000:1 drop, tol 1e-10, V(1,1)-PCG):

    n      pc-Galerkin   BoxMG
    128        49          11
    256        67          12     <- h-independent

The coarse operator is built in closed form (galerkin_closed): P has <= 4
entries per fine parity class and A has <= 9 offsets, so every Galerkin
coupling is a finite sum of parity-sliced triple products — fused
elementwise XLA reading each array O(1) times. A comb-probing construction
(galerkin_boxmg: coarse points with indices equal mod 3 are never coupled
in a 9-point A_c, so nine R(A(P(comb))) probes recover every entry) is kept
as the independently-derived oracle the closed form is tested against.
HYPRE pays a comparable PFMG setup, src/LinearSolver_StructHypre.hpp:217-237.

Replaces: HYPRE StructPCG+PFMG (reference default,
src/LinearSolver_StructHypre.hpp:31-32) — same role, stronger convergence.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from fluidsolver_tpu.core.fields import register_pytree_dataclass
from fluidsolver_tpu.poisson.linsys import StencilOp, apply_op

MAX_LEVELS = 16
COARSEST = 4
# min-dim coarsening stop leaves anisotropic grids with elongated coarsest
# levels (e.g. 94x3 for a 750x15 channel); 16 symmetric sweep pairs keep
# those solved well enough, and cost nothing on square (<=4^2) coarsest
COARSE_SWEEPS = 32
# Direct coarse solve: stop coarsening once a level is small enough for a
# precomputed dense inverse (min-dim <= DIRECT_COARSEST and unknowns <=
# DIRECT_CAP) and solve it EXACTLY with one tiny matvec per cycle. The
# sweep path above runs ~64 color-update kernels per cycle on a 2D-trivial
# problem — pure kernel-launch latency on TPU (measured: the coarsest
# fori_loop dominated deep V-cycles in latency-degraded windows); it
# remains only for elongated anisotropic coarsest levels that exceed the
# cap. Square production grids now stop 2 levels earlier (16^2 instead of
# 4^2) with an exact coarse solve, which also slightly strengthens the
# cycle.
DIRECT_COARSEST = 16
DIRECT_CAP = 512


@register_pytree_dataclass
@dataclasses.dataclass
class Stencil9:
    """9-point operator as coefficient arrays (5-point + corners)."""

    aC: jnp.ndarray
    aL: jnp.ndarray
    aR: jnp.ndarray
    aB: jnp.ndarray
    aT: jnp.ndarray
    aSW: jnp.ndarray
    aSE: jnp.ndarray
    aNW: jnp.ndarray
    aNE: jnp.ndarray


@register_pytree_dataclass
@dataclasses.dataclass
class BoxTransfer:
    """Interpolation weights, all shaped (Nc, Mc) = coarse shape.

    Fine index convention (N = fine rows, Nc = (N+1)//2):
      fine (2k,   2l)   <- injection from coarse (k, l)
      fine (2k+1, 2l)   <- pW[k,l]*c(k,l)   + pE[k,l]*c(k+1,l)
      fine (2k,   2l+1) <- pS[k,l]*c(k,l)   + pN[k,l]*c(k,l+1)
      fine (2k+1, 2l+1) <- pSW[k,l]*c(k,l)  + pSE[k,l]*c(k+1,l)
                         + pNW[k,l]*c(k,l+1)+ pNE[k,l]*c(k+1,l+1)
    Rows beyond the fine grid (when N or M is even, k = Nc-1 edge cases)
    carry zero weights.
    """

    pW: jnp.ndarray
    pE: jnp.ndarray
    pS: jnp.ndarray
    pN: jnp.ndarray
    pSW: jnp.ndarray
    pSE: jnp.ndarray
    pNW: jnp.ndarray
    pNE: jnp.ndarray


@register_pytree_dataclass
@dataclasses.dataclass
class BoxLevel:
    op: object          # StencilOp (finest) or Stencil9 (coarse levels)
    red: jnp.ndarray    # checkerboard mask for the smoother
    tr: object          # BoxTransfer to the next coarser level, or None
    coarse_inv: object = None  # dense inverse on a direct-solve coarsest level
    # (planeU, planeV) fine-shaped parity-packed weights for the fused
    # Pallas transfer paths (pallas_vcycle.pack_transfer), or None
    tr_fine: object = None
    # TailPack covering THIS and all coarser levels as one Pallas launch
    # (pallas_tail), or None
    tail: object = None
    # (coefs, planes) pre-padded to the fused smoother's band layout
    # (pallas_vcycle.pack_banded) — loop-invariant, built once per
    # hierarchy so fused_smooth skips ~9-11 full-array pads per call
    banded: object = None


def _corners(op):
    if isinstance(op, Stencil9):
        return op.aSW, op.aSE, op.aNW, op.aNE
    z = jnp.zeros_like(op.aC)
    return z, z, z, z


def apply_op9(op: Stencil9, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x for the 9-point stencil, zero beyond-edge neighbors."""

    def sh(a, di, dj):
        # value of a at (i+di, j+dj), zero outside
        if di == -1:
            a = jnp.pad(a[:-1, :], ((1, 0), (0, 0)))
        elif di == 1:
            a = jnp.pad(a[1:, :], ((0, 1), (0, 0)))
        if dj == -1:
            a = jnp.pad(a[:, :-1], ((0, 0), (1, 0)))
        elif dj == 1:
            a = jnp.pad(a[:, 1:], ((0, 0), (0, 1)))
        return a

    return (
        op.aC * x
        + op.aL * sh(x, -1, 0) + op.aR * sh(x, 1, 0)
        + op.aB * sh(x, 0, -1) + op.aT * sh(x, 0, 1)
        + op.aSW * sh(x, -1, -1) + op.aSE * sh(x, 1, -1)
        + op.aNW * sh(x, -1, 1) + op.aNE * sh(x, 1, 1)
    )


def apply_any(op, x):
    return apply_op(op, x) if isinstance(op, StencilOp) else apply_op9(op, x)


def _safe(d):
    return jnp.where(d == 0.0, 1.0, d)


def _pad_to(a, shape):
    return jnp.pad(a, ((0, shape[0] - a.shape[0]), (0, shape[1] - a.shape[1])))


def stride2(a, i0=0, j0=0):
    """``a[i0::2, j0::2]`` as a contiguous offset slice + ONE layout-change
    reshape + static parity index. Stride-2 slices lower to catastrophic
    gathers on TPU (PERF.md "stride-2 slices are TPU poison") and defeat
    GSPMD partitioning — they were the source of the full-field all-gathers
    tools/collective_census.py flagged in the sharded step's setup."""
    a = a[i0:, j0:]
    N, M = a.shape
    n_out, m_out = (N + 1) // 2, (M + 1) // 2
    a = jnp.pad(a, ((0, 2 * n_out - N), (0, 2 * m_out - M)))
    return a.reshape(n_out, 2, m_out, 2)[:, 0, :, 0]


def collapse_weights(op) -> BoxTransfer:
    """Operator-collapsed interpolation weights (Dendy 1982 eqs. 3.2-3.5).

    Fine points on coarse lines collapse their row perpendicular to the
    line; (odd, odd) points collapse the full row using the line weights.
    For zero-row-sum operators every P row sums to 1 (constants preserved ->
    Galerkin coarse operators keep the all-Neumann nullspace); identity
    (pinned) rows get zero weights.
    """
    c, w, e, s, n = op.aC, op.aL, op.aR, op.aB, op.aT
    asw, ase, anw, ane = _corners(op)
    N, M = c.shape
    Nc, Mc = (N + 1) // 2, (M + 1) // 2

    # x-line points (odd i): collapse columns of the 3x3 row
    pW_full = -(w + anw + asw) / _safe(c + n + s)
    pE_full = -(e + ane + ase) / _safe(c + n + s)
    # y-line points (odd j): collapse rows
    pS_full = -(s + asw + ase) / _safe(c + w + e)
    pN_full = -(n + anw + ane) / _safe(c + w + e)

    # pad by 1 so i+1 / j+1 reads at the high edge are in range (their
    # operator coefficients are zero there, so the value is irrelevant).
    # All neighbor reads below are pure strided slices — no gather ops
    # (2D advanced-index gathers here tripped heap corruption in XLA:CPU).
    def pad1(a):
        return jnp.pad(a, ((0, 1), (0, 1)))

    pWf, pEf, pSf, pNf = map(pad1, (pW_full, pE_full, pS_full, pN_full))

    nk = len(range(1, N, 2))  # number of odd-i rows
    nl = len(range(1, M, 2))  # number of odd-j cols

    def at(arr, rows, cols):
        # arr[(odd i) + rows offset, (odd j) + cols offset]:
        # rows/cols in {-1, 0, +1} relative to the (odd, odd) lattice
        return stride2(arr, 1 + rows, 1 + cols)[:nk, :nl]

    def oo(arr):  # arr[(odd, odd)]
        return stride2(arr, 1, 1)[:nk, :nl]

    cden = _safe(oo(c))
    vSW = oo(asw) + oo(w) * at(pSf, -1, 0) + oo(s) * at(pWf, 0, -1)
    vSE = oo(ase) + oo(e) * at(pSf, +1, 0) + oo(s) * at(pEf, 0, -1)
    vNW = oo(anw) + oo(w) * at(pNf, -1, 0) + oo(n) * at(pWf, 0, +1)
    vNE = oo(ane) + oo(e) * at(pNf, +1, 0) + oo(n) * at(pEf, 0, +1)

    shape = (Nc, Mc)
    return BoxTransfer(
        pW=_pad_to(stride2(pW_full, 1, 0), shape),
        pE=_pad_to(stride2(pE_full, 1, 0), shape),
        pS=_pad_to(stride2(pS_full, 0, 1), shape),
        pN=_pad_to(stride2(pN_full, 0, 1), shape),
        pSW=_pad_to(-vSW / cden, shape),
        pSE=_pad_to(-vSE / cden, shape),
        pNW=_pad_to(-vNW / cden, shape),
        pNE=_pad_to(-vNE / cden, shape),
    )


def prolong_box(tr: BoxTransfer, e: jnp.ndarray, fine_shape) -> jnp.ndarray:
    """Fine = P e (interleave injection / line / interior contributions)."""
    Nc, Mc = e.shape
    ep = jnp.pad(e, ((0, 1), (0, 1)))  # zero-extend for k+1 / l+1 reads
    inj = e
    xedge = tr.pW * e + tr.pE * ep[1:Nc + 1, :Mc]
    yedge = tr.pS * e + tr.pN * ep[:Nc, 1:Mc + 1]
    inter = (
        tr.pSW * e + tr.pSE * ep[1:Nc + 1, :Mc]
        + tr.pNW * ep[:Nc, 1:Mc + 1] + tr.pNE * ep[1:Nc + 1, 1:Mc + 1]
    )
    row_even = jnp.stack([inj, yedge], axis=-1).reshape(Nc, 2 * Mc)
    row_odd = jnp.stack([xedge, inter], axis=-1).reshape(Nc, 2 * Mc)
    fine = jnp.stack([row_even, row_odd], axis=1).reshape(2 * Nc, 2 * Mc)
    return fine[: fine_shape[0], : fine_shape[1]]


def restrict_box(tr: BoxTransfer, r: jnp.ndarray) -> jnp.ndarray:
    """Coarse = P^T r (exact transpose of prolong_box -> the V-cycle stays
    a symmetric preconditioner for PCG)."""
    N, M = r.shape
    Nc, Mc = (N + 1) // 2, (M + 1) // 2
    shape = (Nc, Mc)
    inj = _pad_to(stride2(r, 0, 0), shape)
    X = _pad_to(stride2(r, 1, 0), shape)   # x-edge values, index (k, l)
    Y = _pad_to(stride2(r, 0, 1), shape)
    T = _pad_to(stride2(r, 1, 1), shape)

    def shm(a, di, dj):
        # a[k - di, l - dj] with zero outside (gather "previous" entries)
        if di:
            a = jnp.pad(a[:-1, :], ((1, 0), (0, 0)))
        if dj:
            a = jnp.pad(a[:, :-1], ((0, 0), (1, 0)))
        return a

    out = inj
    out = out + tr.pW * X + shm(tr.pE * X, 1, 0)
    out = out + tr.pS * Y + shm(tr.pN * Y, 0, 1)
    out = out + tr.pSW * T + shm(tr.pSE * T, 1, 0)
    out = out + shm(tr.pNW * T, 0, 1) + shm(tr.pNE * T, 1, 1)
    return out


def galerkin_boxmg(op, tr: BoxTransfer, fine_shape) -> Stencil9:
    """Exact Galerkin coarse operator A_c = P^T A P by comb probing.

    A_c is 9-point (P has radius-1 fine support per coarse point, A radius
    1), so coarse points whose indices agree mod 3 are never coupled: nine
    probes with period-3 combs recover all entries exactly.
    """
    import jax

    Nc, Mc = tr.pW.shape
    dtype = tr.pW.dtype
    I = lax.broadcasted_iota(jnp.int32, (Nc, Mc), 0)
    J = lax.broadcasted_iota(jnp.int32, (Nc, Mc), 1)

    # all nine probes as ONE vmapped R(A(P(.))) chain: 9x smaller XLA graph
    # than unrolling, and the batch feeds the VPU full tiles
    combs = jnp.stack([
        (((I % 3) == a) & ((J % 3) == b)).astype(dtype)
        for a in range(3) for b in range(3)
    ])
    Ys = jax.vmap(
        lambda c: restrict_box(tr, apply_any(op, prolong_box(tr, c, fine_shape)))
    )(combs)
    Y = {(a, b): Ys[3 * a + b] for a in range(3) for b in range(3)}

    def coef(dI, dJ):
        # entry A_c((I,J) -> (I+dI, J+dJ)) lives in the comb of that class
        out = jnp.zeros((Nc, Mc), dtype)
        for a in range(3):
            for b in range(3):
                mask = (((I + dI) % 3) == a) & (((J + dJ) % 3) == b)
                out = out + jnp.where(mask, Y[(a, b)], 0.0)
        # zero couplings that point outside the coarse grid
        valid = (I + dI >= 0) & (I + dI < Nc) & (J + dJ >= 0) & (J + dJ < Mc)
        return jnp.where(valid, out, 0.0)

    return Stencil9(
        aC=coef(0, 0),
        aL=coef(-1, 0), aR=coef(1, 0), aB=coef(0, -1), aT=coef(0, 1),
        aSW=coef(-1, -1), aSE=coef(1, -1), aNW=coef(-1, 1), aNE=coef(1, 1),
    )


# ---- closed-form Galerkin product ------------------------------------------
# A_c = P^T A P enumerated symbolically: P has <= 4 entries per fine-parity
# class, A has 5 or 9 offsets, so every coarse coupling is a finite sum of
# triple products  w1 * a * w2  sampled at affine positions in the coarse
# index — pure parity-strided slices + fused elementwise math. Equivalent to
# (and tested against) the comb probing in galerkin_boxmg, but reads each
# array O(1) times instead of once per probe (~6x less setup traffic).

# P entries per fine parity (a, b): (sI, sJ, weight_name)
#   fine (2k+a, 2l+b) <- coarse (k+sI, l+sJ) with weight W[k, l]
_P_ENTRIES = {
    (0, 0): [(0, 0, "one")],
    (1, 0): [(0, 0, "pW"), (1, 0, "pE")],
    (0, 1): [(0, 0, "pS"), (0, 1, "pN")],
    (1, 1): [(0, 0, "pSW"), (1, 0, "pSE"), (0, 1, "pNW"), (1, 1, "pNE")],
}
_A_OFFSETS = {
    "aC": (0, 0), "aL": (-1, 0), "aR": (1, 0), "aB": (0, -1), "aT": (0, 1),
    "aSW": (-1, -1), "aSE": (1, -1), "aNW": (-1, 1), "aNE": (1, 1),
}
_OFF_NAME = {v: k for k, v in _A_OFFSETS.items()}


def _enumerate_rap_terms(ncoef):
    """Terms for A_c[(K,L) -> (K+DK, L+DL)]: list keyed by (DK, DL) of
    (w1_name, g1, d1, a_name, alpha, beta, w2_name, g2, d2) where weights
    are sampled at coarse (K+g, L+d) and the operator at fine
    (2K+alpha, 2L+beta)."""
    names = list(_A_OFFSETS)[:ncoef]
    out = {}
    for (a1, b1), entries1 in _P_ENTRIES.items():
        for s1I, s1J, w1 in entries1:
            # column constraint: coarse (K, L) => k_f = K - s1I, l_f = L - s1J
            for a_name in names:
                di, dj = _A_OFFSETS[a_name]
                a2, b2 = (a1 + di) % 2, (b1 + dj) % 2
                for s2I, s2J, w2 in _P_ENTRIES[(a2, b2)]:
                    g1, d1 = -s1I, -s1J
                    alpha, beta = a1 - 2 * s1I, b1 - 2 * s1J
                    g2 = -s1I + (a1 + di - a2) // 2
                    d2 = -s1J + (b1 + dj - b2) // 2
                    DK, DL = g2 + s2I, d2 + s2J
                    out.setdefault((DK, DL), []).append(
                        (w1, g1, d1, a_name, alpha, beta, w2, g2, d2)
                    )
    return out


def galerkin_closed(op, tr: BoxTransfer, fine_shape) -> Stencil9:
    """Closed-form A_c = P^T A P (same result as galerkin_boxmg)."""
    N, M = fine_shape
    Nc, Mc = (N + 1) // 2, (M + 1) // 2
    ncoef = 9 if isinstance(op, Stencil9) else 5
    dtype = op.aC.dtype

    # pre-padded sources so every affine sample is a plain strided slice
    fine_pad = {
        name: jnp.pad(getattr(op, name), 2)
        for name in list(_A_OFFSETS)[:ncoef]
    }
    w_arrays = {name: getattr(tr, name) for name in
                ("pW", "pE", "pS", "pN", "pSW", "pSE", "pNW", "pNE")}
    coarse_pad = {name: jnp.pad(a, 1) for name, a in w_arrays.items()}

    fine_cache = {}

    def fine_at(name, alpha, beta):
        key = (name, alpha, beta)
        if key not in fine_cache:
            a = fine_pad[name]
            fine_cache[key] = stride2(a, 2 + alpha, 2 + beta)[:Nc, :Mc]
        return fine_cache[key]

    coarse_cache = {}

    def coarse_at(name, g, d):
        if name == "one":
            return None  # weight 1
        key = (name, g, d)
        if key not in coarse_cache:
            a = coarse_pad[name]
            coarse_cache[key] = a[1 + g:1 + g + Nc, 1 + d:1 + d + Mc]
        return coarse_cache[key]

    terms = _enumerate_rap_terms(ncoef)
    I = lax.broadcasted_iota(jnp.int32, (Nc, Mc), 0)
    J = lax.broadcasted_iota(jnp.int32, (Nc, Mc), 1)

    coefs = {}
    for (DK, DL), ts in terms.items():
        acc = jnp.zeros((Nc, Mc), dtype)
        for (w1, g1, d1, a_name, alpha, beta, w2, g2, d2) in ts:
            v = fine_at(a_name, alpha, beta)
            c1 = coarse_at(w1, g1, d1)
            if c1 is not None:
                v = v * c1
            c2 = coarse_at(w2, g2, d2)
            if c2 is not None:
                v = v * c2
            acc = acc + v
        valid = (I + DK >= 0) & (I + DK < Nc) & (J + DL >= 0) & (J + DL < Mc)
        coefs[(DK, DL)] = jnp.where(valid, acc, 0.0)

    return Stencil9(
        aC=coefs[(0, 0)],
        aL=coefs[(-1, 0)], aR=coefs[(1, 0)],
        aB=coefs[(0, -1)], aT=coefs[(0, 1)],
        aSW=coefs[(-1, -1)], aSE=coefs[(1, -1)],
        aNW=coefs[(-1, 1)], aNE=coefs[(1, 1)],
    )


def _dense_coarse_inverse(op) -> jnp.ndarray:
    """Dense symmetric inverse of a (small) coarsest-level operator.

    The stencil is materialized into an (n, n) matrix, all-zero (padded)
    rows become identity, and the constant nullspace of the all-Neumann
    case is deflated with a rank-one shift ``c/n_live * v v^T`` restricted
    to live rows (v = live indicator, c = mean |diag|): symmetric positive
    definite either way, and the shift direction's solution component is
    discarded downstream (cg.solve_pcg projects the preconditioned residual
    in the singular case).

    The shift is applied ONLY when the operator actually carries the
    constant nullspace (live row sums ~ 0 — Galerkin coarsening preserves
    this property level to level). Deflating a NONSINGULAR pinned operator
    would overwrite its tiny quasi-constant eigenvalue with ``c``: PCG
    shrugs that off in one extra iteration, but the stationary MG solver
    (krylov.solve_mg, the SMG/PFMG-standalone analog) then stalls at a
    0.999 contraction rate in that one mode — measured as a hard stall at
    rel ~ 1e-1 on pinned jump systems.

    Low-precision hierarchies (FS_PRECOND_DTYPE=bfloat16) assemble and
    invert in f32: linalg.inv has no bf16 kernel (LAPACK raises on CPU) and
    a bf16 inverse would be useless anyway; v_cycle casts around the
    matvec."""
    c = op.aC
    N, M = c.shape
    n = N * M
    dtype = jnp.promote_types(c.dtype, jnp.float32)
    names = list(_A_OFFSETS) if isinstance(op, Stencil9) else list(_A_OFFSETS)[:5]
    I = lax.broadcasted_iota(jnp.int32, (N, M), 0)
    J = lax.broadcasted_iota(jnp.int32, (N, M), 1)
    rows = (I * M + J).ravel()
    A = jnp.zeros((n, n), dtype)
    for name in names:
        di, dj = _A_OFFSETS[name]
        coef = getattr(op, name)
        valid = (I + di >= 0) & (I + di < N) & (J + dj >= 0) & (J + dj < M)
        cols = jnp.clip(((I + di) * M + (J + dj)).ravel(), 0, n - 1)
        vals = jnp.where(valid, coef, 0.0).astype(dtype).ravel()
        A = A.at[rows, cols].add(vals)
    diag = jnp.diagonal(A)
    live = diag != 0.0
    A = A + jnp.diag(jnp.where(live, 0.0, jnp.ones((), dtype)))
    v = live.astype(dtype)
    n_live = jnp.maximum(jnp.sum(v), 1.0)
    shift = jnp.sum(jnp.abs(diag)) / n_live
    # deflate only a genuinely singular (all-Neumann) operator: zero live
    # row sums <=> constant in the nullspace (see docstring)
    rowsum_defect = jnp.max(jnp.abs(jnp.where(live, A @ v, 0.0)))
    eps = jnp.finfo(dtype).eps
    singularish = rowsum_defect < jnp.sqrt(eps) * shift
    A = A + jnp.where(singularish, shift / n_live, 0.0) * jnp.outer(v, v)
    inv = jnp.linalg.inv(A)
    return 0.5 * (inv + inv.T)


def _checkerboard(shape, dtype):
    ii = lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = lax.broadcasted_iota(jnp.int32, shape, 1)
    return (((ii + jj) % 2) == 0).astype(dtype)


def _tr_fine_wanted() -> bool:
    """Pack fine-space transfer planes at build time (a handful of XLA
    kernels per level) iff the fused smoother will consume them."""
    return _use_pallas_vc()


def _stop_here(shape, n_levels_incl: int) -> tuple[bool, bool]:
    """(done, direct) for a level of ``shape`` when the hierarchy holds
    ``n_levels_incl`` levels counting this one — the SINGLE stop predicate
    shared by the build loop and _remaining_depth (they must agree or the
    fused tail pack's depth silently diverges from the real hierarchy).
    ``direct``: small enough for the dense coarse inverse. ``done`` also
    stops on the MIN dimension (collapsing below ~4 cells produces empty
    odd-index slices / degenerate gathers) and on MAX_LEVELS."""
    direct = (min(shape) <= DIRECT_COARSEST
              and shape[0] * shape[1] <= DIRECT_CAP)
    done = (n_levels_incl >= MAX_LEVELS or min(shape) <= COARSEST
            or direct)
    return done, direct


def _remaining_depth(shape, built: int) -> int:
    """How many levels build_hierarchy would still produce from ``shape``
    after ``built`` existing levels (same stop logic as the build loop)."""
    n, m, d = shape[0], shape[1], 0
    while True:
        d += 1
        done, _ = _stop_here((n, m), built + d)
        if done:
            return d
        n, m = (n + 1) // 2, (m + 1) // 2


def _tailsetup_on() -> bool:
    """FS_PALLAS_TAILSETUP (default ON since round 5; =0 disables):
    stop the hierarchy build at the tail start and construct the whole
    TailPack with the ONE-launch setup kernel (pallas_tail.
    build_tail_pack_fused) instead of per-level XLA chains. Requires the
    tail itself (FS_PALLAS_VCYCLE + FS_PALLAS_TAIL) to be in play."""
    from fluidsolver_tpu.flags import pallas_platform_ok

    # default ON since r5: TPU-validated 2026-08-21 (tools/
    # validate_tailsetup_tpu.py, artifacts/validate_tailsetup_r5.log):
    # hierarchy census 225 -> 101 real kernels, same tail start [65,65],
    # exactly one tail, iters 33 vs 34, probe rel diff 2.7e-7 — PASSED.
    if os.environ.get("FS_PALLAS_TAILSETUP", "1") != "1":
        return False
    if os.environ.get("FS_PALLAS_TAIL", "1") != "1":
        return False
    return _tr_fine_wanted() and pallas_platform_ok()


def _rap_fused_ok(shape, dtype) -> bool:
    """Gate for the fused Pallas setup kernel (pallas_rap.fused_rap):
    default-on for TPU single-chip (FS_PALLAS_RAP overrides; pallas_call
    does not partition under GSPMD), and a shape the banded kernel
    accepts."""
    from fluidsolver_tpu.flags import pallas_enabled

    if not pallas_enabled("FS_PALLAS_RAP"):
        return False
    from fluidsolver_tpu.poisson import pallas_rap

    return pallas_rap.available(shape, dtype)


def build_hierarchy(op: StencilOp) -> list[BoxLevel]:
    """Finest level keeps the 5-point operator (no wasted zero-corner
    bandwidth on the dominant-cost sweeps); coarse levels are 9-point."""
    dtype = op.aC.dtype
    levels = []
    cur = op
    while True:
        shape = cur.aC.shape
        done, direct = _stop_here(shape, len(levels) + 1)
        if not done and _tailsetup_on():
            # ONE-launch tail setup: stop descending at the tail start —
            # the fused kernel builds every sub-tail operator and transfer
            # plane itself (pallas_tail.build_tail_pack_fused), so the
            # per-level XLA chains below this point never exist at all
            from fluidsolver_tpu.poisson import pallas_tail as pt

            n_rem = _remaining_depth(shape, len(levels))
            if pt.available_shape(shape, n_rem, dtype):
                level = BoxLevel(op=cur, red=_checkerboard(shape, dtype),
                                 tr=None)
                level.tail = pt.build_tail_pack_fused(cur, n_rem)
                levels.append(level)
                return _attach_fused_vcycle(levels)
        nxt = None
        packed = None
        if done:
            tr = None
        elif _rap_fused_ok(shape, dtype):
            from fluidsolver_tpu.poisson import pallas_rap

            # fused setup also returns the PACKED transfer planes built
            # canvas-side (one masked select each) — attaching them here
            # lets _attach_fused_vcycle skip the 8-unpack + 12-reshape
            # pack_transfer per level
            tr, nxt, packed = pallas_rap.fused_rap(cur)
            if not _tr_fine_wanted():
                packed = None
        else:
            tr = collapse_weights(cur)
        levels.append(BoxLevel(
            op=cur, red=_checkerboard(shape, dtype), tr=tr,
            tr_fine=packed,
        ))
        if done:
            levels = _attach_fused_vcycle(levels)
            if direct and all(l.tail is None for l in levels):
                # the dense inverse is dead weight when the tail kernel
                # covers the coarsest level (it sweeps in-kernel instead)
                levels[-1].coarse_inv = _dense_coarse_inverse(cur)
            return levels
        cur = nxt if nxt is not None else galerkin_closed(cur, tr, shape)


def cast_hierarchy(levels: list[BoxLevel], dtype) -> list[BoxLevel]:
    """Cast a built hierarchy's STORAGE to ``dtype`` (e.g. bf16 — half the
    V-cycle's HBM traffic) while keeping its full-precision build quality:
    the Galerkin RAP products and transfer weights are computed in the
    build dtype (f32, including the fused Pallas RAP path) and rounded
    ONCE, instead of compounding rounding level over level by building in
    the narrow dtype. The packed fused-kernel operands (tr_fine, banded,
    tail) are re-derived in the new dtype — their band layout is dtype-
    dependent (sublane tile 16 vs 8). The dense coarse inverse stays in
    f32 (see _dense_coarse_inverse) and is built here from the ORIGINAL
    full-precision coarsest operator if the (dtype-gated) tail no longer
    covers it."""
    import dataclasses as dc

    if (levels and levels[-1].tail is not None
            and jnp.dtype(dtype) != jnp.float32):
        # Tailsetup-truncated list: the fused tail pack is f32-only, so the
        # re-attach below would fail its dtype gate and leave the coarsest
        # at the tail-start size (65-129/side) with only RB sweeps — a
        # large silent preconditioner loss. Rebuild the complete XLA
        # hierarchy from the original finest f32 operator with the fused
        # setup disabled, and cast that instead.
        env_prev = os.environ.get("FS_PALLAS_TAILSETUP")
        os.environ["FS_PALLAS_TAILSETUP"] = "0"
        try:
            levels = build_hierarchy(levels[0].op)
        finally:
            if env_prev is None:
                os.environ.pop("FS_PALLAS_TAILSETUP", None)
            else:
                os.environ["FS_PALLAS_TAILSETUP"] = env_prev

    def cast_struct(s):
        if s is None:
            return None
        return dc.replace(s, **{
            f.name: getattr(s, f.name).astype(dtype) for f in dc.fields(s)
        })

    out = [
        BoxLevel(op=cast_struct(l.op), red=l.red.astype(dtype),
                 tr=cast_struct(l.tr), coarse_inv=l.coarse_inv)
        for l in levels
    ]
    out = _attach_fused_vcycle(out)
    if all(l.tail is None for l in out) and out[-1].coarse_inv is None:
        shape = out[-1].op.aC.shape
        if (min(shape) <= DIRECT_COARSEST
                and shape[0] * shape[1] <= DIRECT_CAP):
            out[-1].coarse_inv = _dense_coarse_inverse(levels[-1].op)
    return out


def _attach_fused_vcycle(levels):
    """Post-pass for the fused Pallas V-cycle (FS_PALLAS_VCYCLE=1, TPU,
    single device): attach the coarse-tail mega-kernel pack at the first
    level where the whole remaining hierarchy fits one launch, and the
    packed transfer planes to the (finer) levels above it."""
    if not _tr_fine_wanted():
        return levels
    from fluidsolver_tpu.poisson import pallas_tail as pt
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    tail_lvl = len(levels)
    if os.environ.get("FS_PALLAS_TAIL", "1") == "1":
        # When a level already carries a tail (the fused-setup truncated
        # build), it IS the tail start: consulting pt.available on finer
        # levels would re-evaluate depth on the truncated list (where a
        # finer level's remaining depth shrinks to ~2 and passes the VMEM
        # gate it failed at full depth) and attach a spurious shallow
        # host-built pack that shadows the fused one (v_cycle engages the
        # first tail, silently stopping the descent at 65-129 per side).
        has_tail = any(l.tail is not None for l in levels)
        for lvl in range(len(levels)):
            if (levels[lvl].tail is not None
                    or (not has_tail and pt.available(levels, lvl))):
                tail_lvl = lvl
                break
        if tail_lvl == len(levels) and _tailsetup_on() and levels:
            # fused-setup TRUNCATED list (no sub-tail levels exist, so
            # available()'s depth gate can't see the tail) — e.g. the
            # cast_hierarchy re-attach. Rebuild the pack from the last
            # level's operator alone.
            lvl = len(levels) - 1
            op_l = levels[lvl].op
            n_rem = _remaining_depth(op_l.aC.shape, lvl)
            if pt.available_shape(op_l.aC.shape, n_rem, op_l.aC.dtype):
                tail_lvl = lvl
    for lvl in range(tail_lvl):
        # the fused-RAP build already attached canvas-built packed planes
        # (bit-identical, ~2 fusions instead of ~20) — keep them
        if levels[lvl].tr is not None and levels[lvl].tr_fine is None:
            levels[lvl].tr_fine = pv.pack_transfer(
                levels[lvl].tr, levels[lvl].op.aC.shape)
    if tail_lvl < len(levels) and levels[tail_lvl].tail is None:
        if tail_lvl == len(levels) - 1:  # fused-setup truncated list
            op_l = levels[tail_lvl].op
            levels[tail_lvl].tail = pt.build_tail_pack_fused(
                op_l, _remaining_depth(op_l.aC.shape, tail_lvl))
        else:
            levels[tail_lvl].tail = pt.build_tail_pack(levels, tail_lvl)
    # pre-pad the loop-invariant fused_smooth operands (coefs + planes)
    # once per hierarchy — fused_smooth otherwise re-pads ~11 full arrays
    # per call (bandwidth + launch toll, see pack_banded docstring)
    for lvl in range(min(tail_lvl, len(levels) - 1)):
        level = levels[lvl]
        if pv.available(level.op.aC.shape, level.op.aC.dtype):
            level.banded = pv.pack_banded(level.op, level.tr_fine)
    return levels


def _rb_sweep(level: BoxLevel, x, b, reverse=False):
    """Red-black sweep; on 9-point levels the same-color diagonal couplings
    use previous-iterate values (standard two-color smoothing for 9-point
    stencils — still an excellent BoxMG smoother, validated in the
    prototype)."""
    op = level.op
    aC_safe = _safe(op.aC)

    def color_update(x, mask):
        ax_off = apply_any(op, x) - op.aC * x
        x_new = (b - ax_off) / aC_safe
        return jnp.where(mask > 0.5, x_new, x)

    first = 1.0 - level.red if reverse else level.red
    x = color_update(x, first)
    x = color_update(x, 1.0 - first)
    return x


import os


def _use_pallas_vc() -> bool:
    """Fused temporally-blocked smoothing (pallas_vcycle.fused_smooth): one
    HBM pass for a whole smoothing phase + residual instead of one pass per
    half-sweep. Default-on for TPU single-chip (validated on hardware);
    FS_PALLAS_VCYCLE overrides. CPU runs use the XLA sweeps (the kernels
    themselves are validated on CPU eagerly via interpret=True in tests);
    multi-device GSPMD programs also skip the kernels — pallas_call does
    not partition, the XLA path shards correctly."""
    from fluidsolver_tpu.flags import pallas_enabled

    return pallas_enabled("FS_PALLAS_VCYCLE")


def _fused_ok(level: BoxLevel, b) -> bool:
    if not _use_pallas_vc():
        return False
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    return pv.available(b.shape, b.dtype)


def v_cycle(levels: list[BoxLevel], b: jnp.ndarray, n_pre: int = 1,
            n_post: int = 1, fine_padded: bool = False) -> jnp.ndarray:
    """One symmetric V(n_pre, n_post) cycle from a zero initial guess.

    ``fine_padded``: the FINE-level rhs ``b`` arrives (and x returns) in the
    pallas_vcycle band-padded (N_total, M_pad) layout — the padded-carry
    contract of cg.solve_pcg. Callers must ensure the fine level runs the
    fused smoother with packed transfers (cg gates on levels[0].banded /
    .tr_fine / .tail); coarser levels are untouched (raw shapes)."""

    def cycle(lvl, b_l):
        level = levels[lvl]
        if fine_padded and lvl == 0:
            from fluidsolver_tpu.poisson import pallas_vcycle as pv

            # hard precondition, not an assert (asserts vanish under -O):
            # a raw-layout b in here would silently smooth garbage rows
            if (level.tail is not None or level.tr_fine is None
                    or level.banded is None):
                raise ValueError(
                    "v_cycle(fine_padded=True) requires the fused fine "
                    "level (no tail, packed transfers, pre-padded bands) "
                    "— cg.solve_pcg's padded_carry gate enforces this")
            x, bc = pv.fused_smooth(
                level.op, b_l, colors=(True, False) * n_pre,
                tr_planes=level.tr_fine, restrict=True,
                banded=level.banded, padded_io=True,
            )
            ec = cycle(lvl + 1, bc)
            return pv.fused_smooth(
                level.op, b_l, x0=x, colors=(False, True) * n_post,
                tr_planes=level.tr_fine, ec=ec,
                banded=level.banded, padded_io=True,
            )
        if level.tail is not None:
            # whole remaining hierarchy in one Pallas launch (the coarsest
            # level runs COARSE_SWEEPS symmetric sweeps in-kernel instead
            # of the dense inverse — a launch-free, still-symmetric cycle)
            from fluidsolver_tpu.poisson import pallas_tail as pt

            return pt.tail_cycle(level.tail, b_l, n_pre, n_post)
        x = jnp.zeros_like(b_l)
        if lvl == len(levels) - 1:
            if level.coarse_inv is not None:
                # exact coarse solve: ONE tiny matvec instead of ~64
                # latency-bound color-update kernels (inverse held in f32
                # even for bf16 hierarchies — see _dense_coarse_inverse)
                inv = level.coarse_inv
                xc = inv @ b_l.ravel().astype(inv.dtype)
                return xc.reshape(b_l.shape).astype(b_l.dtype)
            # fori_loop, not unrolled: 32 sweep pairs of 9-point color
            # updates would otherwise dominate the whole solver's XLA graph
            def pair(_, x):
                x = _rb_sweep(level, x, b_l)
                return _rb_sweep(level, x, b_l, reverse=True)

            return lax.fori_loop(0, COARSE_SWEEPS // 2, pair, x)
        if _fused_ok(level, b_l):
            from fluidsolver_tpu.poisson import pallas_vcycle as pv

            if level.tr_fine is not None:
                # transfers fused into the smoothing kernels: restriction
                # rides the pre-smoother's residual epilogue, prolongation+
                # correction the post-smoother's prologue
                x, bc = pv.fused_smooth(
                    level.op, b_l, colors=(True, False) * n_pre,
                    tr_planes=level.tr_fine, restrict=True,
                    banded=level.banded,
                )
                ec = cycle(lvl + 1, bc)
                return pv.fused_smooth(
                    level.op, b_l, x0=x, colors=(False, True) * n_post,
                    tr_planes=level.tr_fine, ec=ec,
                    banded=level.banded,
                )
            x, r = pv.fused_smooth(
                level.op, b_l, colors=(True, False) * n_pre,
                residual=True, banded=level.banded,
            )
            ec = cycle(lvl + 1, restrict_box(level.tr, r))
            x = x + prolong_box(level.tr, ec, b_l.shape)
            return pv.fused_smooth(
                level.op, b_l, x0=x, colors=(False, True) * n_post,
                banded=level.banded,
            )
        for _ in range(n_pre):
            x = _rb_sweep(level, x, b_l)
        r = b_l - apply_any(level.op, x)
        ec = cycle(lvl + 1, restrict_box(level.tr, r))
        x = x + prolong_box(level.tr, ec, b_l.shape)
        for _ in range(n_post):
            x = _rb_sweep(level, x, b_l, reverse=True)
        return x

    return cycle(0, b)
