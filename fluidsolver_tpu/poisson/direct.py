"""Dense direct pressure solve for small boxes.

Backend-parity row C15: the reference falls back to Apple Accelerate sparse
CG with diagonal preconditioning (src/LinearSolver_Accelerate.hpp:54-146) —
here the small-grid alternative is an exact dense solve (and the diagonal-
preconditioned CG lives in poisson/cg.py as ``precond="jacobi"``).
"""

from __future__ import annotations

import jax.numpy as jnp

from fluidsolver_tpu.poisson.linsys import StencilOp


def dense_matrix(op: StencilOp) -> jnp.ndarray:
    """Materialize the 5-point operator as a dense (N*M, N*M) matrix."""
    N, M = op.aC.shape
    n = N * M
    k = jnp.arange(n)
    A = jnp.zeros((n, n), op.aC.dtype)
    A = A.at[k, k].set(op.aC.reshape(-1))
    iw = k - M
    A = A.at[k[M:], iw[M:]].set(op.aL.reshape(-1)[M:])
    ie = k + M
    A = A.at[k[:-M], ie[:-M]].set(op.aR.reshape(-1)[:-M])
    js = (k % M) > 0
    A = A.at[jnp.where(js, k, 0), jnp.where(js, k - 1, 0)].add(
        jnp.where(js, op.aB.reshape(-1), 0.0)
    )
    jn = (k % M) < M - 1
    A = A.at[jnp.where(jn, k, 0), jnp.where(jn, k + 1, 0)].add(
        jnp.where(jn, op.aT.reshape(-1), 0.0)
    )
    return A


def solve_direct(op: StencilOp, b: jnp.ndarray, singular: bool):
    """Exact solve; the singular all-Neumann system is regularized by the
    rank-one nullspace shift (A + ee^T/n), which leaves the zero-mean
    solution unchanged for a zero-mean RHS."""
    N, M = op.aC.shape
    n = N * M
    A = dense_matrix(op)
    rhs = b.reshape(-1)
    if singular:
        A = A + jnp.ones((n, n), A.dtype) / n
        rhs = rhs - jnp.mean(rhs)
    x = jnp.linalg.solve(A, rhs)
    if singular:
        x = x - jnp.mean(x)
    return x.reshape(N, M)