"""BiCGSTAB / restarted GMRES / MG-only solvers for the pressure system.

The reference's HYPRE wrapper exposes a solver enum {GMRES, PCG, BiCGSTAB,
SMG, PFMG} with preconditioner {SMG, PFMG, NONE}
(src/HYPREUtility.hpp:35-36, src/LinearSolver_StructHypre.hpp:196-287). PCG
lives in poisson/cg.py (the production default); this module completes the
solver surface:

- ``solve_bicgstab`` — preconditioned BiCGSTAB (HYPRE_StructBiCGSTAB analog).
- ``solve_gmres``    — restarted, right-preconditioned GMRES(m)
  (HYPRE_StructGMRES analog; true residual recomputed at each restart).
- ``solve_mg``       — the V-cycle iterated AS the solver (HYPRE's SMG/PFMG
  used standalone rather than as a preconditioner).

All three share poisson/cg.py's conventions: the whole solve (including the
convergence test) runs inside ``lax.while_loop`` — one XLA computation, no
host sync; stopping criterion is the relative two-norm ``||b - A x|| / ||b||
< tol``; the singular all-Neumann operator is handled by projecting the
constant nullspace out of b, the iterates, and every preconditioned vector
(cf. src/LinearSystem.hpp:147-152's mean subtraction); non-finite /
breakdown iterations reject the update and exit with the last good iterate
rather than returning NaN (NaN > tol is False, which would FALSELY signal
convergence).

The pressure operator is SPD, so PCG is the right production choice — these
exist for API parity, robustness experiments (BiCGSTAB tolerates the mildly
nonsymmetric operators that arise from one-sided IB closures), and as
reference-matching baselines.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

from fluidsolver_tpu.poisson.linsys import StencilOp, apply_op


def _dot(a, b):
    return jnp.sum(a * b)


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _projector(singular: bool):
    def project(v):
        return v - jnp.mean(v) if singular else v

    return project


def _prepare(op, b, singular, x0):
    """Shared setup: project b, form the (guarded) warm-started residual."""
    project = _projector(singular)
    b = project(b)
    b_norm = _norm(b)
    safe_b_norm = jnp.where(b_norm > 0.0, b_norm, 1.0)
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        x0 = project(x0.astype(b.dtype))
        r_ws = b - apply_op(op, x0)
        good = _dot(r_ws, r_ws) < _dot(b, b)
        x0 = jnp.where(good, x0, jnp.zeros_like(b))
        r0 = jnp.where(good, r_ws, b)
    return project, b, b_norm, safe_b_norm, x0, r0


def solve_bicgstab(
    op: StencilOp,
    b: jnp.ndarray,
    tol: float,
    max_iter: int,
    singular: bool,
    M_inv: Callable[[jnp.ndarray], jnp.ndarray],
    x0: Optional[jnp.ndarray] = None,
):
    """Preconditioned BiCGSTAB (van der Vorst 1992). Returns
    ``(x, rel_residual, iterations)``. One iteration = 2 operator
    applications + 2 preconditioner applications."""
    project, b, b_norm, safe_b_norm, x0, r0 = _prepare(op, b, singular, x0)
    rhat = r0  # fixed shadow residual
    rel0 = _norm(r0) / safe_b_norm

    def cond(c):
        _, _, _, _, _, _, _, k, rel, done = c
        return (k < max_iter) & (rel > tol) & (b_norm > 0.0) & (~done)

    def body(c):
        x, r, p, v, rho, alpha, omega, k, rel, done = c
        rho_new = _dot(rhat, r)
        beta = (rho_new / jnp.where(rho != 0.0, rho, 1.0)) * (
            alpha / jnp.where(omega != 0.0, omega, 1.0)
        )
        p_new = r + beta * (p - omega * v)
        phat = project(M_inv(p_new))
        v_new = apply_op(op, phat)
        denom = _dot(rhat, v_new)
        alpha_new = rho_new / jnp.where(denom != 0.0, denom, 1.0)
        s = r - alpha_new * v_new
        shat = project(M_inv(s))
        t = apply_op(op, shat)
        tt = _dot(t, t)
        omega_new = _dot(t, s) / jnp.where(tt != 0.0, tt, 1.0)
        x_new = x + alpha_new * phat + omega_new * shat
        r_new = s - omega_new * t
        rel_new = _norm(r_new) / safe_b_norm
        # breakdown/overflow guard: keep the last good iterate and exit
        ok = (
            jnp.isfinite(rel_new)
            & jnp.isfinite(rho_new)
            & (jnp.abs(rho_new) > 0.0)
            & (jnp.abs(denom) > 0.0)
            & (tt > 0.0)
        )
        x_out = jnp.where(ok, x_new, x)
        r_out = jnp.where(ok, r_new, r)
        rel_out = jnp.where(ok, rel_new, rel)
        return (
            x_out, r_out,
            jnp.where(ok, p_new, p), jnp.where(ok, v_new, v),
            jnp.where(ok, rho_new, rho), jnp.where(ok, alpha_new, alpha),
            jnp.where(ok, omega_new, omega),
            k + 1, rel_out, ~ok,
        )

    one = jnp.ones((), b.dtype)
    zeros = jnp.zeros_like(b)
    x, _, _, _, _, _, _, iters, rel, _ = lax.while_loop(
        cond, body,
        (x0, r0, zeros, zeros, one, one, one, 0, rel0, False),
    )
    return project(x) if singular else x, rel, iters


def solve_gmres(
    op: StencilOp,
    b: jnp.ndarray,
    tol: float,
    max_iter: int,
    singular: bool,
    M_inv: Callable[[jnp.ndarray], jnp.ndarray],
    restart: int = 20,
    x0: Optional[jnp.ndarray] = None,
):
    """Restarted right-preconditioned GMRES(m) with Givens-rotation QR of the
    Hessenberg matrix. Returns ``(x, rel_residual, iterations)``.

    Right preconditioning keeps the monitored quantity the TRUE residual
    norm ``||b - A x||`` (the Arnoldi residual |g[j+1]| equals it in exact
    arithmetic), and the true residual is recomputed at every restart so
    rounding drift cannot fake convergence. ``max_iter`` caps the total
    number of inner (Arnoldi) steps across restarts.
    """
    project, b, b_norm, safe_b_norm, x0, r0 = _prepare(op, b, singular, x0)
    m = int(restart)
    shape = b.shape
    n = b.size
    dtype = b.dtype
    rel0 = _norm(r0) / safe_b_norm

    def inner_cycle(x, r, k_done):
        """One GMRES(m) cycle from residual r; returns (x_new, k_new)."""
        beta = _norm(r)
        safe_beta = jnp.where(beta > 0.0, beta, 1.0)
        V0 = jnp.zeros((m + 1, n), dtype).at[0].set((r / safe_beta).ravel())
        H0 = jnp.zeros((m + 1, m), dtype)
        cs0 = jnp.zeros((m,), dtype)
        sn0 = jnp.zeros((m,), dtype)
        g0 = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def arn_cond(c):
            _, _, _, _, g, j = c
            # stop growing the space once the rotated residual |g[j]| is
            # below tol, the space is full, or the global budget is spent
            rel = jnp.abs(g[j]) / safe_b_norm
            return (j < m) & (rel > tol) & (k_done + j < max_iter)

        def arn_body(c):
            V, H, cs, sn, g, j = c
            vj = V[j].reshape(shape)
            w = apply_op(op, project(M_inv(vj))).ravel()
            # modified-Gram-Schmidt against the full (zero-padded) basis:
            # columns > j are zero so the masked dots are exact
            hcol = V @ w  # (m+1,) — only entries <= j are meaningful
            mask = jnp.arange(m + 1) <= j
            hcol = jnp.where(mask, hcol, 0.0)
            w = w - hcol @ V
            h_next = jnp.sqrt(jnp.sum(w * w))
            V = V.at[j + 1].set(w / jnp.where(h_next > 0.0, h_next, 1.0))
            # apply the accumulated Givens rotations to the new column
            def rot(i, col):
                a, bb = col[i], col[i + 1]
                col = col.at[i].set(cs[i] * a + sn[i] * bb)
                return col.at[i + 1].set(-sn[i] * a + cs[i] * bb)

            col = hcol.at[j + 1].set(h_next)
            col = lax.fori_loop(0, j, rot, col)
            # new rotation annihilating col[j+1]
            denom = jnp.sqrt(col[j] ** 2 + col[j + 1] ** 2)
            safe = jnp.where(denom > 0.0, denom, 1.0)
            c_new = jnp.where(denom > 0.0, col[j] / safe, 1.0)
            s_new = jnp.where(denom > 0.0, col[j + 1] / safe, 0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            col = col.at[j].set(c_new * col[j] + s_new * col[j + 1])
            col = col.at[j + 1].set(0.0)
            H = H.at[:, j].set(col[: m + 1])
            gj = g[j]
            g = g.at[j].set(c_new * gj)
            g = g.at[j + 1].set(-s_new * gj)
            return (V, H, cs, sn, g, j + 1)

        V, H, cs, sn, g, j = lax.while_loop(
            arn_cond, arn_body, (V0, H0, cs0, sn0, g0, 0)
        )

        # back substitution on the j×j upper-triangular system (masked to m)
        def back(i_rev, y):
            i = m - 1 - i_rev
            active = i < j
            resid = g[i] - jnp.dot(H[i, :], y)
            hii = H[i, i]
            yi = resid / jnp.where(hii != 0.0, hii, 1.0)
            return y.at[i].set(jnp.where(active, yi, 0.0))

        y = lax.fori_loop(0, m, back, jnp.zeros((m,), dtype))
        z = (y @ V[:m]).reshape(shape)
        x_new = x + project(M_inv(z))
        # guard: a broken cycle (non-finite) keeps the previous iterate
        x_new = jnp.where(jnp.all(jnp.isfinite(x_new)), x_new, x)
        return x_new, k_done + j

    def cond(c):
        _, rel, k, stalled = c
        return (k < max_iter) & (rel > tol) & (b_norm > 0.0) & (~stalled)

    def body(c):
        x, rel, k, _ = c
        r = b - apply_op(op, x)  # true residual at each restart
        x_new, k_new = inner_cycle(x, r, k)
        r_new = b - apply_op(op, x_new)
        rel_new = _norm(r_new) / safe_b_norm
        # a cycle that makes no progress (singular/stagnated) must not spin
        stalled = (rel_new >= rel) | (k_new == k)
        better = rel_new < rel
        return (
            jnp.where(better, x_new, x),
            jnp.where(better, rel_new, rel),
            k_new,
            stalled,
        )

    x, rel, iters, _ = lax.while_loop(cond, body, (x0, rel0, 0, False))
    return project(x) if singular else x, rel, iters


def solve_mg(
    op: StencilOp,
    b: jnp.ndarray,
    tol: float,
    max_iter: int,
    singular: bool,
    M_inv: Callable[[jnp.ndarray], jnp.ndarray],
    x0: Optional[jnp.ndarray] = None,
):
    """Stationary multigrid iteration: ``x <- x + V(b - A x)`` until the
    relative residual drops below tol (HYPRE's SMG/PFMG used AS the solver,
    src/LinearSolver_StructHypre.hpp:262-287). ``M_inv`` is one V-cycle
    (cg.make_m_inv with precond "mg"/"boxmg"). Each iteration costs one
    V-cycle + one residual evaluation."""
    project, b, b_norm, safe_b_norm, x0, r0 = _prepare(op, b, singular, x0)
    rel0 = _norm(r0) / safe_b_norm

    def cond(c):
        _, _, rel, k, done = c
        return (k < max_iter) & (rel > tol) & (b_norm > 0.0) & (~done)

    def body(c):
        x, r, rel, k, _ = c
        x_new = project(x + project(M_inv(r)))
        r_new = b - apply_op(op, x_new)
        rel_new = _norm(r_new) / safe_b_norm
        # diverging or non-finite cycle: keep the last good iterate, exit
        ok = jnp.isfinite(rel_new) & (rel_new < rel)
        return (
            jnp.where(ok, x_new, x),
            jnp.where(ok, r_new, r),
            jnp.where(ok, rel_new, rel),
            k + 1,
            ~ok,
        )

    x, _, rel, iters, _ = lax.while_loop(cond, body, (x0, r0, rel0, 0, False))
    return project(x) if singular else x, rel, iters
