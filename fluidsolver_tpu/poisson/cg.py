"""Preconditioned conjugate gradients for the pressure Poisson solve.

Replaces HYPRE StructPCG + PFMG preconditioning (the reference default,
src/LinearSolver_StructHypre.hpp:31-32, 239-260) with an on-device PCG whose
preconditioner is one geometric-multigrid V-cycle (poisson/mg.py). The whole
solve — including the convergence test — runs inside one ``lax.while_loop``,
so a pressure solve is a single XLA computation with no host sync.

Convergence criterion: relative two-norm ||r||/||b|| < tol, matching
HYPRE_StructPCGSetTol semantics.

For the singular all-Neumann system (no pinned edge) both the preconditioned
direction and the iterate are kept orthogonal to the constant nullspace by
mean subtraction.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax.numpy as jnp
from jax import lax

from fluidsolver_tpu.poisson import mg as mg_mod
from fluidsolver_tpu.poisson.linsys import StencilOp, apply_op


def _dot(a, b):
    return jnp.sum(a * b)


def build_precond_levels(op: StencilOp, precond: str, precond_dtype=None):
    """Build the multigrid hierarchy for ``precond`` in {"mg", "boxmg"}.

    Exposed so solvers can hoist the (per-operator) setup out of their
    subiteration loops: the preconditioner may lag the operator by a few
    subiterations of density transport — PCG only needs M to be a fixed SPD
    map per solve — which amortizes one setup over ``num_subiter`` solves.
    (The reference pays a full HYPRE PFMG re-setup per subiteration instead,
    examples/TwoPhaseSolver.cpp:360.)
    """
    if precond == "boxmg":
        from fluidsolver_tpu.poisson import boxmg as mg_impl
    elif precond == "mg":
        mg_impl = mg_mod
    else:
        return None
    # always build under jit: inside a jitted solver this inlines, and the
    # eager path (trace-time constant builds, tests) avoids an XLA:CPU
    # heap-corruption bug hit by the boxmg setup's eager op-by-op dispatch
    import jax

    if precond_dtype is not None and precond_dtype != op.aC.dtype:
        if precond == "boxmg":
            # build at FULL precision (fused f32 RAP path, no per-level
            # rounding compounding), then cast the hierarchy's storage —
            # see boxmg.cast_hierarchy
            return jax.jit(
                lambda o: mg_impl.cast_hierarchy(
                    mg_impl.build_hierarchy(o), precond_dtype)
            )(op)
        import dataclasses as _dc

        op = _dc.replace(
            op, **{f.name: getattr(op, f.name).astype(precond_dtype)
                   for f in _dc.fields(op)}
        )
    return jax.jit(mg_impl.build_hierarchy)(op)


def make_m_inv(op: StencilOp, b_dtype, precond: str, levels=None,
               n_pre: int = 1, n_post: int = 1, precond_dtype=None):
    """Build the preconditioner application ``M_inv: r -> z`` (in ``b_dtype``)
    for ``precond`` in {"mg", "boxmg", "jacobi", "none"}. Returns
    ``(M_inv, levels)`` so callers can reuse a hoisted hierarchy. Shared by
    PCG (this module) and the BiCGSTAB/GMRES/MG-only solvers
    (poisson/krylov.py)."""
    if precond in ("mg", "boxmg"):
        if precond == "boxmg":
            from fluidsolver_tpu.poisson import boxmg as mg_impl
        else:
            mg_impl = mg_mod
        if levels is None:
            levels = build_precond_levels(op, precond, precond_dtype)
        lvl_dtype = levels[0].op.aC.dtype

        if lvl_dtype != b_dtype:
            def M_inv(r):
                z = mg_impl.v_cycle(
                    levels, r.astype(lvl_dtype), n_pre=n_pre, n_post=n_post
                )
                # low-precision cycles can emit non-finite values on extreme
                # operators (bf16 rounding can make a near-singular coarse
                # row blow up); a NaN direction would poison x permanently
                # while the NaN relative residual FALSELY exits the loop
                # (NaN > tol is False). Sanitize: a zeroed direction merely
                # wastes the iteration and the stagnation guard stays honest.
                return jnp.nan_to_num(z.astype(r.dtype),
                                      nan=0.0, posinf=0.0, neginf=0.0)
        else:
            def M_inv(r):
                return mg_impl.v_cycle(levels, r, n_pre=n_pre, n_post=n_post)
    elif precond == "jacobi":
        aC_safe = jnp.where(op.aC == 0.0, 1.0, op.aC)

        def M_inv(r):
            return r / aC_safe
    elif precond == "none":
        def M_inv(r):
            return r
    else:
        raise ValueError(f"unknown preconditioner: {precond}")
    return M_inv, levels


def solve_pcg(
    op: StencilOp,
    b: jnp.ndarray,
    tol: float,
    max_iter: int,
    singular: bool,
    precond: str = "mg",
    n_pre: int = 1,
    n_post: int = 1,
    precond_dtype=None,
    x0: Optional[jnp.ndarray] = None,
    levels=None,
):
    """Solve A x = b from a zero initial guess (or warm start ``x0``).

    Returns (x, rel_residual, iterations). ``singular=True`` enables nullspace
    projection for the all-Neumann operator.

    ``x0``: optional warm-start guess (e.g. the previous subiteration's
    pressure increment). The convergence criterion stays ``||b - A x|| /
    ||b|| < tol`` — identical solution quality to a cold start, just fewer
    iterations when ``x0`` is good. Guarded: if ``||b - A x0|| > ||b||`` the
    guess is discarded, so a bad guess costs one operator application and
    nothing else. (The reference always zeroes the initial guess,
    src/LinearSolver_StructHypre.hpp:123-127 — warm starting is a strict
    improvement the HYPRE wrapper never attempts.)

    ``precond_dtype`` (e.g. ``jnp.bfloat16``): run the MG V-cycle in a lower
    precision than the CG iteration. The V-cycle is pure HBM-bandwidth-bound
    stencil sweeps, so halving the bytes nearly halves its cost on TPU; the
    preconditioner stays a fixed deterministic SPD-to-rounding map, which PCG
    tolerates (bf16 keeps the f32 exponent, so only mantissa is lost).
    """
    M_inv, levels = make_m_inv(op, b.dtype, precond, levels=levels,
                               n_pre=n_pre, n_post=n_post,
                               precond_dtype=precond_dtype)

    def project(v):
        if singular:
            return v - jnp.mean(v)
        return v

    # Stagnation guard: in f32 the CG recurrence residual hits a rounding
    # floor (~eps32 * kappa(A) for the strong-jump operator) that can sit
    # ABOVE ``tol`` — without a guard, every such solve burns the full
    # ``max_iter`` budget making no progress (measured: 4.8x total-iteration
    # blowup vs f64 on a 1000:1 gravity drop). Stop once the residual has
    # not improved by >0.01% for ``STAG_WINDOW`` consecutive iterations; the
    # returned ``rel`` stays honest (it is always the achieved recurrence
    # residual, never clamped to tol). The window is dtype-aware: weakly-
    # preconditioned CG on jump coefficients shows genuine 25+-iteration
    # plateaus before recovering, so in f64 (where the floor is ~1e-15 and
    # essentially never limits a physical tolerance) the window is very
    # conservative; in f32 (the TPU production path, floor ~eps32*kappa)
    # it is tight — the extra window iterations are cheap next to the
    # hundreds saved per capped solve.
    STAG_WINDOW = 25 if jnp.finfo(b.dtype).bits <= 32 else 100

    def cond(carry):
        # ``rel`` is carried from the body — no extra reduction pass here
        _, _, _, _, _, k, rel, best, since = carry
        return (
            (k < max_iter) & (rel > tol) & (b_norm > 0.0)
            & (since < STAG_WINDOW)
        )

    # Fused-iteration kernels (FS_PALLAS_CG=1, TPU, single device): the
    # matvec+dots+axpys of one iteration lower to ~13 XLA fusions; two
    # Pallas launches replace them (see poisson/pallas_cg.py). The fused
    # reduction order differs from jnp.sum at rounding level — CG is
    # self-correcting, convergence criteria are unchanged.
    from fluidsolver_tpu.flags import pallas_enabled

    use_fused_iter = False
    padded_carry = False
    if pallas_enabled("FS_PALLAS_CG"):
        from fluidsolver_tpu.poisson import pallas_cg

        use_fused_iter = pallas_cg.available(b.shape, b.dtype)
        if use_fused_iter:
            # pad the loop-invariant operator planes ONCE, outside the loop
            op_padded = pallas_cg.pad_operator(op, b.shape)
            # Padded-carry: keep EVERY loop-carried full-size vector
            # (x, r, z, p, x_best) in the shared band-padded layout across
            # the whole while_loop — pad once here, extract once after.
            # Kills the ~14 per-iteration pad/extract kernels (and their
            # ~130 MB/iter of HBM copies) that step_ab / the fine-level
            # fused_smooth / step_c otherwise re-issue every iteration.
            # Requires the fine level of M^-1 to be the fused smoother
            # with packed transfers in the SAME layout (boxmg.v_cycle
            # fine_padded), same storage dtype, and no fine-level tail.
            if precond == "boxmg" and precond_dtype is None and levels:
                lvl0 = levels[0]
                padded_carry = (
                    len(levels) > 1
                    and getattr(lvl0, "tail", None) is None
                    and getattr(lvl0, "banded", None) is not None
                    and getattr(lvl0, "tr_fine", None) is not None
                    and lvl0.op.aC.dtype == b.dtype
                )
    if padded_carry:
        from fluidsolver_tpu.poisson import boxmg as _boxmg
        from fluidsolver_tpu.poisson import pallas_cg

        def M_inv_pad(rp):
            return _boxmg.v_cycle(levels, rp, n_pre=n_pre, n_post=n_post,
                                  fine_padded=True)

        # Fused init (pallas_cg.step_init): project(b), <b,b>, the
        # warm-start residual + accept/reject dots, rel0, sum(r0) — one
        # banded launch instead of ~10 XLA kernels, all in the padded
        # layout. z0/p0/rz0 then reuse step_c in its p=None init form
        # (masked projection in-kernel — the zero-pad invariant holder).
        shape = b.shape
        b_pad = pallas_cg.pad_vec(b, shape)
        x0_pad = (pallas_cg.pad_vec(x0.astype(b.dtype), shape)
                  if x0 is not None else None)
        x0, r0, bb, rr0, sum_r0 = pallas_cg.step_init(
            op_padded, b_pad, x0_pad, singular=singular, shape=shape)
        b_norm = jnp.sqrt(bb)
        safe_b_norm = jnp.where(b_norm > 0.0, b_norm, 1.0)
        rel0 = jnp.sqrt(rr0) / safe_b_norm
        z0, p0, rz0 = pallas_cg.step_c(
            r0, M_inv_pad(r0), None, jnp.ones((), b.dtype), singular,
            sum_r=sum_r0, padded_io=True, shape=shape)
    else:
        b = project(b)
        b_norm = jnp.sqrt(_dot(b, b))
        safe_b_norm = jnp.where(b_norm > 0.0, b_norm, 1.0)
        if x0 is None:
            x0 = jnp.zeros_like(b)
            r0 = b  # zero initial guess
        else:
            # warm start, guarded: if ||b - A x0|| > ||b|| the guess is
            # discarded (one operator application, nothing else)
            x0 = project(x0.astype(b.dtype))
            r_ws = b - apply_op(op, x0)
            good = _dot(r_ws, r_ws) < _dot(b, b)
            x0 = jnp.where(good, x0, jnp.zeros_like(b))
            r0 = jnp.where(good, r_ws, b)
        rel0 = jnp.sqrt(_dot(r0, r0)) / safe_b_norm
        z0 = project(M_inv(r0))
        p0 = z0
        rz0 = _dot(r0, z0)

    def body(carry):
        x0_, r0_, z0_, p0_, rz, k, rel0_, best, since, x_best = carry
        if use_fused_iter:
            from fluidsolver_tpu.poisson import pallas_cg

            io_kw = (dict(padded_io=True, shape=b.shape)
                     if padded_carry else {})
            x, r, pAp, rr, sum_r = pallas_cg.step_ab(
                op_padded, x0_, r0_, p0_, rz, **io_kw)
            z_raw = M_inv_pad(r) if padded_carry else M_inv(r)
            z, p, rz_new = pallas_cg.step_c(
                r, z_raw, p0_, rz, singular, sum_r=sum_r, **io_kw)
            rel = jnp.sqrt(rr) / safe_b_norm
        else:
            Ap = apply_op(op, p0_)
            pAp = _dot(p0_, Ap)
            alpha = rz / jnp.where(pAp != 0.0, pAp, 1.0)
            x = x0_ + alpha * p0_
            r = r0_ - alpha * Ap
            z = project(M_inv(r))
            rz_new = _dot(r, z)
            beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
            p = z + beta * p0_
            rel = jnp.sqrt(_dot(r, r)) / safe_b_norm
        # Breakdown guard: for an SPD system pAp > 0 whenever p != 0; a
        # non-positive or non-finite value means the (rounded, e.g. bf16)
        # preconditioner broke CG's invariants this iteration. Reject the
        # update — keep the last good iterate — and trip the stagnation
        # exit. Without this, alpha overflows, x goes NaN, and the NaN
        # relative residual FALSELY satisfies the loop exit (NaN > tol is
        # False) while returning a poisoned solution.
        ok = (pAp > 0.0) & jnp.isfinite(rel) & jnp.isfinite(rz_new)
        x = jnp.where(ok, x, x0_)
        r = jnp.where(ok, r, r0_)
        z = jnp.where(ok, z, z0_)
        p = jnp.where(ok, p, p0_)
        rz_new = jnp.where(ok, rz_new, rz)
        rel = jnp.where(ok, rel, rel0_)
        improved = ok & (rel < best * 0.9999)
        best = jnp.minimum(best, rel)
        since = jnp.where(improved, 0,
                          jnp.where(ok, since + 1, STAG_WINDOW))
        # Best-iterate tracking: in the rhs-noise regime (|b| at the f32
        # rounding floor of the divergence, e.g. MovingDrop at 1e9 density
        # ratio once the field is uniform) PCG wanders in the drop-interior
        # near-nullspace (aC ~ 1e-9 rows) and the LAST iterate can be far
        # worse than the first (measured rel up to 16 vs rel0 = 1). Return
        # the best iterate instead: one extra selected write per improved
        # iteration, and the returned (x, rel) are never worse than the
        # cold start. See PERF.md "f32 tolerance parity".
        x_best = jnp.where(rel <= best, x, x_best)
        return (x, r, z, p, rz_new, k + 1, rel, best, since, x_best)

    _, _, _, _, _, iters, _, best, _, x_best = lax.while_loop(
        lambda c: cond(c[:9]), body,
        (x0, r0, z0, p0, rz0, 0, rel0, rel0, 0, x0),
    )
    x, rel = x_best, best
    if padded_carry:
        x = pallas_cg.extract_vec(x, b.shape)
    return project(x) if singular else x, rel, iters
