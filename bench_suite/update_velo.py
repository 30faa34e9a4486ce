"""Fused velocity-update benchmark (bench/update-velo-fuse.cpp analog).

Usage: python bench_suite/update_velo.py [NX NY]
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
    rho = jnp.ones(g.shape_u, dt)
    rho_v = jnp.ones(g.shape_v, dt)
    dU = jax.random.normal(key, g.shape_u, dt)
    dV = jax.random.normal(key, g.shape_v, dt)

    def kernel(c):
        U, V, rho, rho_v, dU, dV = c
        U2, V2 = mom.update_velocity(U, V, rho, rho_v, rho, rho_v, dU, dV, 1e-3, U, V)
        return (U2, V2, rho, rho_v, dU, dV)

    mean, std = time_kernel(kernel, (U, V, rho, rho_v, dU, dV))
    print(f"update_velocity {nx}x{ny}: {mean * 1e3:.3f} ± {std * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
