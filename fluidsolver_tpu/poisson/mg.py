"""Geometric multigrid V-cycle for the 5-point pressure operator.

TPU-native replacement for HYPRE's PFMG preconditioner
(reference: src/LinearSolver_StructHypre.hpp:217-237 — PFMG, 1 V-cycle,
1 pre-/1 post-relaxation, <= 16 levels). Design choices:

  * coarsening: 2x2 cell aggregation with piecewise-constant transfer and an
    exact Galerkin (RAP) coarse operator — for a 5-point fine operator the
    Galerkin product with PC transfers is again 5-point, so every level stays
    matrix-free with five coefficient arrays (reshape-sums build it, no
    sparse algebra needed);
  * smoother: red-black Gauss-Seidel via checkerboard masks — each color
    update is one dense stencil sweep + select, which XLA fuses;
  * odd level sizes are zero-padded (decoupled dummy cells guarded by
    ``aC == 0 -> 1`` in the smoother).

All shapes are static; the V-cycle unrolls over the (static) level list, so
the whole cycle jits into one XLA program with no host round trips.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fluidsolver_tpu.core.fields import register_pytree_dataclass
from fluidsolver_tpu.poisson.linsys import StencilOp, apply_op

MAX_LEVELS = 16  # parity with PS_PFMG_MAX_LEVELS (LinearSolver_StructHypre.hpp:229)
COARSEST = 4     # stop coarsening at <= 4 cells per side
COARSE_SWEEPS = 16


@register_pytree_dataclass
@dataclasses.dataclass
class MGLevel:
    op: StencilOp
    # checkerboard mask (1.0 on "red" cells), kept as an array for fusion
    red: jnp.ndarray


def _checkerboard(shape, dtype) -> jnp.ndarray:
    ii = jnp.arange(shape[0])[:, None]
    jj = jnp.arange(shape[1])[None, :]
    return (((ii + jj) % 2) == 0).astype(dtype)


def _pad_even(a: jnp.ndarray) -> jnp.ndarray:
    px = a.shape[0] % 2
    py = a.shape[1] % 2
    if px or py:
        a = jnp.pad(a, ((0, px), (0, py)))
    return a


def galerkin_coarsen(op: StencilOp) -> StencilOp:
    """Exact RAP with piecewise-constant transfers over 2x2 blocks.

    For block (I,J) = fine cells {2I,2I+1} x {2J,2J+1}:
      aC_c = sum(aC_f) + internal x couplings + internal y couplings
      aL_c = sum_j aL_f(2I, j),   aR_c = sum_j aR_f(2I+1, j)
      aB_c = sum_i aB_f(i, 2J),   aT_c = sum_i aT_f(i, 2J+1)
    """
    aC = _pad_even(op.aC)
    aL = _pad_even(op.aL)
    aR = _pad_even(op.aR)
    aB = _pad_even(op.aB)
    aT = _pad_even(op.aT)
    N, M = aC.shape
    I, J = N // 2, M // 2

    def blocks(a):
        return a.reshape(I, 2, J, 2)

    bC, bL, bR, bB, bT = map(blocks, (aC, aL, aR, aB, aT))

    # internal couplings absorbed into the coarse diagonal
    internal_x = bR[:, 0, :, :].sum(-1) + bL[:, 1, :, :].sum(-1)
    internal_y = bT[:, :, :, 0].sum(1) + bB[:, :, :, 1].sum(1)
    cC = bC.sum((1, 3)) + internal_x + internal_y

    cL = bL[:, 0, :, :].sum(-1)
    cR = bR[:, 1, :, :].sum(-1)
    cB = bB[:, :, :, 0].sum(1)
    cT = bT[:, :, :, 1].sum(1)
    return StencilOp(aC=cC, aL=cL, aR=cR, aB=cB, aT=cT)


def build_hierarchy(op: StencilOp) -> list[MGLevel]:
    dtype = op.aC.dtype
    levels = [MGLevel(op=op, red=_checkerboard(op.aC.shape, dtype))]
    while (
        len(levels) < MAX_LEVELS
        and max(levels[-1].op.aC.shape) > COARSEST
    ):
        c = galerkin_coarsen(levels[-1].op)
        levels.append(MGLevel(op=c, red=_checkerboard(c.aC.shape, dtype)))
    return levels


def restrict_pc(r: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-constant R = P^T: sum over 2x2 blocks (zero-padding odd
    edges). Used for the Galerkin coarse-operator construction."""
    r = _pad_even(r)
    N, M = r.shape
    return r.reshape(N // 2, 2, M // 2, 2).sum((1, 3))


def prolong_pc(e: jnp.ndarray, fine_shape) -> jnp.ndarray:
    """Piecewise-constant injection, cropped back to the fine shape."""
    up = jnp.repeat(jnp.repeat(e, 2, axis=0), 2, axis=1)
    return up[: fine_shape[0], : fine_shape[1]]


# ---- bilinear transfers (cycle transfers; better smoothing-complement) ----
# Cell-centered 2:1 bilinear interpolation: fine cell (2I+a, 2J+b) takes
# 9/16 of coarse (I,J), 3/16 of each adjacent coarse cell toward its
# quadrant, 1/16 of the diagonal; edges clamp (Neumann-consistent). The
# restriction is 4x the exact transpose, so the V-cycle preconditioner
# remains symmetric while the correction keeps PC-Galerkin scaling.
_WC, _WE, _WD = 9.0 / 16.0, 3.0 / 16.0, 1.0 / 16.0


def prolong_bilinear(e: jnp.ndarray, fine_shape) -> jnp.ndarray:
    ep = jnp.pad(e, 1, mode="edge")
    c = ep[1:-1, 1:-1]
    xm, xp = ep[:-2, 1:-1], ep[2:, 1:-1]
    ym, yp = ep[1:-1, :-2], ep[1:-1, 2:]
    dmm, dpm = ep[:-2, :-2], ep[2:, :-2]
    dmp, dpp = ep[:-2, 2:], ep[2:, 2:]
    q00 = _WC * c + _WE * (xm + ym) + _WD * dmm
    q10 = _WC * c + _WE * (xp + ym) + _WD * dpm
    q01 = _WC * c + _WE * (xm + yp) + _WD * dmp
    q11 = _WC * c + _WE * (xp + yp) + _WD * dpp
    I, J = e.shape
    row0 = jnp.stack([q00, q01], axis=-1).reshape(I, 2 * J)
    row1 = jnp.stack([q10, q11], axis=-1).reshape(I, 2 * J)
    fine = jnp.stack([row0, row1], axis=1).reshape(2 * I, 2 * J)
    return fine[: fine_shape[0], : fine_shape[1]]


def _fold_mx(a):
    out = jnp.zeros_like(a).at[:-1, :].add(a[1:, :])
    return out.at[0, :].add(a[0, :])


def _fold_px(a):
    out = jnp.zeros_like(a).at[1:, :].add(a[:-1, :])
    return out.at[-1, :].add(a[-1, :])


def _fold_my(a):
    out = jnp.zeros_like(a).at[:, :-1].add(a[:, 1:])
    return out.at[:, 0].add(a[:, 0])


def _fold_py(a):
    out = jnp.zeros_like(a).at[:, 1:].add(a[:, :-1])
    return out.at[:, -1].add(a[:, -1])


def restrict_bilinear(r: jnp.ndarray) -> jnp.ndarray:
    """4 * P_bilinear^T (zero-extend odd fine edges, then de-interleave)."""
    from fluidsolver_tpu.poisson.boxmg import stride2

    r = _pad_even(r)
    R00 = stride2(r, 0, 0)
    R10 = stride2(r, 1, 0)
    R01 = stride2(r, 0, 1)
    R11 = stride2(r, 1, 1)
    out = _WC * (R00 + R10 + R01 + R11)
    out = out + _WE * (_fold_mx(R00 + R01) + _fold_px(R10 + R11))
    out = out + _WE * (_fold_my(R00 + R10) + _fold_py(R01 + R11))
    out = out + _WD * (
        _fold_mx(_fold_my(R00)) + _fold_px(_fold_my(R10))
        + _fold_mx(_fold_py(R01)) + _fold_px(_fold_py(R11))
    )
    return 4.0 * out


# ---- operator-induced transfers (smoothed-aggregation form) ---------------
# P = (I - D^{-1} A) P_pc : each fine cell interpolates from the coarse
# blocks its stencil neighbors belong to, weighted by the face conductances
# g = -a_face / aC. Across a strong density jump the conductance 1/rho is
# small, so the interpolation takes (almost) nothing from the far side —
# exactly the jump-awareness plain bilinear lacks (see v_cycle docstring).
# R = P^T keeps the V-cycle symmetric for PCG. Equivalent to one omega=1
# Jacobi smoothing step on the aggregation transfer (smoothed aggregation,
# Vanek/Mandel/Brezina 1996), which for the M-matrix 5-point operator gives
# nonnegative weights summing to <= 1.


def prolong_oi(op: StencilOp, e: jnp.ndarray, fine_shape) -> jnp.ndarray:
    ef = prolong_pc(e, fine_shape)
    aC_safe = jnp.where(op.aC == 0.0, 1.0, op.aC)
    return ef - apply_op(op, ef) / aC_safe


def restrict_oi(op: StencilOp, r: jnp.ndarray) -> jnp.ndarray:
    aC_safe = jnp.where(op.aC == 0.0, 1.0, op.aC)
    return restrict_pc(r - apply_op(op, r / aC_safe))


import os

# Opt-in: the fused Pallas sweep is numerically identical (validated on TPU)
# but not faster than XLA's fusion of the in-solver sweeps on current
# measurements, so it stays off by default (SURVEY.md §7: Pallas only where
# XLA demonstrably loses).
_USE_PALLAS = os.environ.get("FS_PALLAS_SMOOTHER", "0") == "1"


def _rb_sweep(level: MGLevel, x: jnp.ndarray, b: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """One red-black Gauss-Seidel sweep. ``reverse`` flips the color order
    (black then red) — used in post-smoothing so the V-cycle is a symmetric
    operator and PCG theory holds."""
    if _USE_PALLAS:
        from fluidsolver_tpu.poisson import pallas_smoother as ps

        if ps.sweep_available(x.shape, x.dtype):
            return ps.rb_sweep_pallas(level.op, x, b, reverse=reverse)
    op = level.op
    aC_safe = jnp.where(op.aC == 0.0, 1.0, op.aC)

    def color_update(x, mask):
        ax_off = apply_op(op, x) - op.aC * x
        x_new = (b - ax_off) / aC_safe
        return jnp.where(mask > 0.5, x_new, x)

    first = 1.0 - level.red if reverse else level.red
    x = color_update(x, first)
    x = color_update(x, 1.0 - first)
    return x


def v_cycle(
    levels: list[MGLevel], b: jnp.ndarray, n_pre: int = 1, n_post: int = 1,
    transfers: str = "pc",
) -> jnp.ndarray:
    """One V(n_pre, n_post) cycle applied to zero initial guess: returns
    an approximation of A^{-1} b (the PCG preconditioner application).

    ``transfers``: "pc" (default), "bilinear", or "oi" (operator-induced).
    Measured PCG iteration counts on the 1000:1 drop problem (tol 1e-10):

        n     pc   bilinear   oi   oi-V(2,2)   [exact-Galerkin SA, scipy]
        128   49      53      53      36              18
        256   67      70      70      54              16

    Neither smooth (bilinear) nor operator-induced transfers help while the
    coarse operators stay PC-Galerkin: bilinear interpolates wrongly across
    jumps, and OI transfers lose their gain to the transfer/coarse-operator
    mismatch. The scipy ground-truth study (mg_scipy experiment) shows the
    full win (49->18, h-independent) requires exact Galerkin RAP with the
    smoothed transfers, whose coarse stencils grow to 25-77 nnz/row — not
    representable in this matrix-free five-array form; stencil truncation
    back to 9-point destroys convergence. PC-Galerkin V(1,1) is therefore
    the best iters-times-bandwidth design point measured so far; the lower-
    precision V-cycle (cg.solve_pcg precond_dtype) attacks the other factor
    (bytes/cycle) instead."""
    if transfers == "bilinear":
        def restrict(level, r):
            return restrict_bilinear(r)

        def prolong(level, e, shape):
            return prolong_bilinear(e, shape)
    elif transfers == "oi":
        def restrict(level, r):
            return restrict_oi(level.op, r)

        def prolong(level, e, shape):
            return prolong_oi(level.op, e, shape)
    else:
        def restrict(level, r):
            return restrict_pc(r)

        def prolong(level, e, shape):
            return prolong_pc(e, shape)

    def cycle(lvl: int, b_l: jnp.ndarray) -> jnp.ndarray:
        level = levels[lvl]
        x = jnp.zeros_like(b_l)
        if lvl == len(levels) - 1:
            # symmetric coarse solve: forward/backward sweep pairs
            # (fori_loop keeps the XLA graph small)
            import jax

            def pair(_, x):
                x = _rb_sweep(level, x, b_l)
                return _rb_sweep(level, x, b_l, reverse=True)

            return jax.lax.fori_loop(0, COARSE_SWEEPS // 2, pair, x)
        for _ in range(n_pre):
            x = _rb_sweep(level, x, b_l)
        r = b_l - apply_op(level.op, x)
        ec = cycle(lvl + 1, restrict(level, r))
        x = x + prolong(level, ec, b_l.shape)
        for _ in range(n_post):
            x = _rb_sweep(level, x, b_l, reverse=True)
        return x

    return cycle(0, b)
