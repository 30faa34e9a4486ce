"""Point-interpolation experiment: bilinear vs nearest-neighbor vs 5-point MLS.

Port of examples/MovingLeastSquaresIB.cpp:193-260 — sample a staggered
Taylor-Green velocity field at an off-grid point with the three evaluators
and print the error of each against the analytic solution.

Usage: python tools/mls_experiment.py [n] [px] [py]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

# Tiny point-sampling workload: always run on host CPU (the axon TPU plugin
# ignores the JAX_PLATFORMS env var; the config call is the reliable switch).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ib.mls import eval_field_at_mls5, eval_field_at_nn
from fluidsolver_tpu.ops.stencil import sample_centered


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    px = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    py = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    g = make_grid(0.0, 2.0 * math.pi, n, 0.0, 2.0 * math.pi, n)

    # TGV at t=0 (examples/MovingLeastSquaresIB.cpp:30-32); U lives at
    # (x, ym), V at (xm, y), each with a 1-cell ghost ring.
    def u_a(x, y):
        return np.sin(x) * np.cos(y)

    def v_a(x, y):
        return -np.cos(x) * np.sin(y)

    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    U = jnp.asarray(u_a(Xu, Yu))
    V = jnp.asarray(v_a(Xv, Yv))

    ua, va = u_a(px, py), v_a(px, py)
    print(f"analytic    : U={ua:+.6e}  V={va:+.6e}")
    p = (jnp.asarray(px), jnp.asarray(py))
    for name, fn in [
        ("bilinear", lambda f, x0, y0: sample_centered(f, x0, g.dx, y0, g.dy, *p)),
        ("nearest  ", lambda f, x0, y0: eval_field_at_nn(f, x0, g.dx, y0, g.dy, *p)),
        ("mls-5pt  ", lambda f, x0, y0: eval_field_at_mls5(f, x0, g.dx, y0, g.dy, *p)),
    ]:
        up = float(fn(U, g.x[1], g.ym[1]))
        vp = float(fn(V, g.xm[1], g.y[1]))
        print(
            f"{name}: U={up:+.6e}  V={vp:+.6e}  "
            f"|dU|={abs(up - ua):.3e}  |dV|={abs(vp - va):.3e}"
        )


if __name__ == "__main__":
    main()
