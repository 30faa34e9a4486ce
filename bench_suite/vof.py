"""VOF reconstruction + advection kernel benchmark.

(No direct reference analog — the IRL hot loop is timed only inside full
cases there; this isolates the geometric kernels.)

Usage: python bench_suite/vof.py [N] [max_active]
  max_active: lane budget of the sparse path (0 = dense all-cells batch,
  default = auto). Compare the two to quantify the sparse win.
"""

from __future__ import annotations

import sys

from common import time_fn


def main():
    import jax
    import jax.numpy as jnp

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import stencil
    from fluidsolver_tpu.vof import advect as adv
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    max_active = int(sys.argv[2]) if len(sys.argv) > 2 else None
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.25**2, g
        ),
        jnp.float32,
    )
    U = jnp.full(g.shape_u, 1.0, jnp.float32)
    V = jnp.full(g.shape_v, 0.5, jnp.float32)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    dt = 0.25 * g.dx

    # NOTE: (a) wrapping advect in lax.fori_loop faults the TPU backend
    # (Mosaic bug); (b) all fields must be jit ARGUMENTS — closure constants
    # are re-uploaded per dispatch through the TPU tunnel.
    @jax.jit
    def step_kernel(vf, U, V, Ui, Vi):
        rec = plic.elvira(vf, g.dx, g.dy)
        return adv.advect(vf, rec, U, V, Ui, Vi, g, dt, max_active=max_active)[0]

    mean, std = time_fn(step_kernel, vf, U, V, Ui, Vi)
    mode = "dense" if max_active == 0 else f"sparse({max_active or adv.default_max_active(n, n)})"
    print(f"elvira+advect {n}x{n} [{mode}]: {mean * 1e3:.3f} ± {std * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
