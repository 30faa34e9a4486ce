"""Pressure-Poisson solver benchmark (bench/LinearSolver.cpp analog).

The reference compares HYPRE PCG+PFMG against Apple Accelerate diagonal-CG;
here the same comparison is MG-PCG vs Jacobi-PCG to tol=1e-6 on two-phase
drop coefficients across grid sizes. Prints CSV `n,precond,solve_ms,iters`.

Usage: python bench_suite/poisson.py [--f64]
"""

from __future__ import annotations

import sys

import numpy as np

from common import time_fn


def main():
    import jax
    import jax.numpy as jnp

    if "--f64" in sys.argv:
        jax.config.update("jax_enable_x64", True)

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import cg, linsys

    print("n,precond,solve_ms,iters,rel_res")
    for n in [64, 128, 256, 512, 1024]:
        g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
        Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
        Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
        rho_u = jnp.asarray(np.where((Xu - 0.5) ** 2 + (Yu - 0.5) ** 2 < 0.0625, 1e3, 1.0))
        rho_v = jnp.asarray(np.where((Xv - 0.5) ** 2 + (Yv - 0.5) ** 2 < 0.0625, 1e3, 1.0))
        rng = np.random.default_rng(0)
        b = rng.normal(size=g.shape_center)
        b -= b.mean()
        b = jnp.asarray(b)

        for precond, max_iter in [("boxmg", 100), ("mg", 100), ("jacobi", 3000)]:
            solve = jax.jit(
                lambda ru, rv, b, p=precond, mi=max_iter: cg.solve_pcg(
                    linsys.assemble_pressure_operator(ru, rv, g.dx, g.dy, None),
                    b, 1e-6, mi, singular=True, precond=p,
                )
            )
            mean, _ = time_fn(solve, rho_u, rho_v, b, reps=5)
            x, rel, iters = solve(rho_u, rho_v, b)
            print(f"{n},{precond},{mean * 1e3:.3f},{int(iters)},{float(rel):.2e}")


if __name__ == "__main__":
    main()
