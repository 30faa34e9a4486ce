"""Divergence-free velocity extrapolation demo.

The reference's examples/DivFreeExtrapolation.cpp sets the analytic
Taylor-Green velocity INSIDE a circle (r=0.25 around the domain center),
writes the fields, and stops at ``TODO: Implement the divergence-free
extrapolation of the velocity field`` (line 94). This tool completes the
example with ops/extrapolate.div_free_extrapolate: constant outward
extrapolation of the staggered components + one masked projection, then
writes the same npy files (x/xm/y/ym/U/V/div/ext) plus the extrapolated
fields, and prints max|div| before/after over the extrapolated region.

Usage: python tools/div_free_extrapolation.py [--n 16] [--out output/...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--visc", type=float, default=1.0)
    ap.add_argument("--rho", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join("output", "div_free_extrapolation"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import fluidsolver_tpu
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import stencil
    from fluidsolver_tpu.ops.extrapolate import div_free_extrapolate

    if args.x64:
        fluidsolver_tpu.enable_x64()

    n = args.n
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    # analytic divergence-free field (DivFreeExtrapolation.cpp:27-33), known
    # only inside the circle (x-.5)^2+(y-.5)^2 <= .25^2 (lines 58-71, t=0)
    def u_ana(x, y):
        return np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)

    def v_ana(x, y):
        return -np.cos(2 * np.pi * x) * np.sin(2 * np.pi * y)

    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    in_u = (Xu - 0.5) ** 2 + (Yu - 0.5) ** 2 <= 0.25**2
    in_v = (Xv - 0.5) ** 2 + (Yv - 0.5) ** 2 <= 0.25**2
    U0 = jnp.asarray(np.where(in_u, u_ana(Xu, Yu), 0.0))
    V0 = jnp.asarray(np.where(in_v, v_ana(Xv, Yv), 0.0))

    div0 = stencil.divergence(U0, V0, g.dx, g.dy)
    U, V, rel, iters = div_free_extrapolate(
        U0, V0, jnp.asarray(in_u), jnp.asarray(in_v), g
    )
    div1 = stencil.divergence(U, V, g.dx, g.dy)

    # report over cells OUTSIDE the fully-known region (the extrapolated part)
    Xc, Yc = np.meshgrid(g.xm, g.ym, indexing="ij")
    outside = jnp.asarray((Xc - 0.5) ** 2 + (Yc - 0.5) ** 2 > 0.25**2)
    outside = outside.at[0, :].set(False).at[-1, :].set(False)
    outside = outside.at[:, 0].set(False).at[:, -1].set(False)
    d0 = float(jnp.max(jnp.abs(jnp.where(outside, div0, 0.0))))
    d1 = float(jnp.max(jnp.abs(jnp.where(outside, div1, 0.0))))
    print(f"masked projection: rel={float(rel):.3e} iters={int(iters)}")
    print(f"max|div| outside known region: {d0:.3e} -> {d1:.3e}")

    os.makedirs(args.out, exist_ok=True)
    ext = outside.astype(U.dtype)
    for name, arr in [("x", g.x), ("xm", g.xm), ("y", g.y), ("ym", g.ym),
                      ("U0", U0), ("V0", V0), ("U", U), ("V", V),
                      ("div0", div0), ("div", div1), ("ext", ext)]:
        np.save(os.path.join(args.out, f"{name}.npy"), np.asarray(arr))
    print(f"wrote fields -> {args.out}")
    return d0, d1


if __name__ == "__main__":
    main()
