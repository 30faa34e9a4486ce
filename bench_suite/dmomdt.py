"""Momentum-RHS kernel benchmark (bench/dmomdt.cpp analog).

The reference benchmarks three fusion variants of calc_dmomdt at 40960x8192;
under XLA there is one fused formulation, benchmarked here at a
memory-comparable size. Prints mean±std ms and achieved cell-updates/s.

Usage: python bench_suite/dmomdt.py [NX NY]
"""

from __future__ import annotations

import sys

from common import time_kernel


def main():
    import jax
    import jax.numpy as jnp

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import momentum as mom

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    g = make_grid(0.0, 1.0, nx, 0.0, 1.0, ny)
    key = jax.random.PRNGKey(0)
    dt = jnp.float32

    U = jax.random.normal(key, g.shape_u, dt)
    V = jax.random.normal(key, g.shape_v, dt)
    rho_u = jnp.ones(g.shape_u, dt)
    rho_v = jnp.ones(g.shape_v, dt)
    visc = jnp.full(g.shape_center, 1e-3, dt)
    p = jax.random.normal(key, g.shape_center, dt)
    pj_u = jnp.zeros(g.shape_u, dt)
    pj_v = jnp.zeros(g.shape_v, dt)

    # everything in the carry: closure-captured arrays become program
    # constants that the tunneled TPU re-uploads per dispatch
    def kernel(c):
        U, V, rho_u, rho_v, visc, p, pj_u, pj_v = c
        dU, dV = mom.calc_dmomdt(U, V, rho_u, rho_v, visc, p, pj_u, pj_v, g.dx, g.dy, 1e-3)
        return (jnp.tanh(dU), jnp.tanh(dV), rho_u, rho_v, visc, p, pj_u, pj_v)

    mean, std = time_kernel(kernel, (U, V, rho_u, rho_v, visc, p, pj_u, pj_v))
    cups = nx * ny / mean
    print(f"calc_dmomdt {nx}x{ny}: {mean * 1e3:.3f} ± {std * 1e3:.3f} ms "
          f"({cups / 1e9:.2f} Gcell-updates/s)")


if __name__ == "__main__":
    main()
