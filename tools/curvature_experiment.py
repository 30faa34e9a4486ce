"""Curvature-accuracy experiment: randomized circles, three methods.

TPU-native analog of the reference's examples/Curvature.cpp:32-247: draw
random circles (center, radius, phase inversion), initialize exact
cell-averaged volume fractions, reconstruct, and evaluate all three
curvature methods; per trial report min/max/mean/MSE/MRSE of the curvature
over mixed cells plus the initialization error, into a Monitor table with
the reference's column names. Runtimes are wall-clock per (jitted) method
call, drained through a device read (see CLAUDE.md on axon timing).

Usage: python tools/curvature_experiment.py [--n 100] [--iters 50]
       [--scale 1.0] [--seed 0] [--out output/curvature]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100, help="grid cells per side")
    ap.add_argument("--iters", type=int, default=50,
                    help="random trials (reference uses 50k; each trial here "
                    "evaluates the whole grid in one dispatch)")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join("output", "curvature"))
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import fluidsolver_tpu
    from fluidsolver_tpu.constants import VF_HIGH, VF_LOW
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.io.monitor import Monitor
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.curvature import (
        curvature_convolved_vf,
        curvature_quad_regression,
        curvature_quad_volume_matching,
    )
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    if args.x64:
        fluidsolver_tpu.enable_x64()

    s = args.scale
    g = make_grid(-s, s, args.n, -s, s, args.n)
    os.makedirs(args.out, exist_ok=True)

    methods = {
        "cv": curvature_convolved_vf,
        "quad-vol": curvature_quad_volume_matching,
        "quad-reg": curvature_quad_regression,
    }

    def metrics_fn(method):
        def run(vf, expected):
            rec = plic.elvira(vf, g.dx, g.dy)
            curv = method(vf, rec, g)
            mixed = (vf > VF_LOW) & (vf < VF_HIGH)
            mixed = mixed.at[0, :].set(False).at[-1, :].set(False)
            mixed = mixed.at[:, 0].set(False).at[:, -1].set(False)
            cnt = jnp.maximum(jnp.sum(mixed), 1)
            big = jnp.asarray(jnp.inf, curv.dtype)
            cmin = jnp.min(jnp.where(mixed, curv, big))
            cmax = jnp.max(jnp.where(mixed, curv, -big))
            cmean = jnp.sum(jnp.where(mixed, curv, 0.0)) / cnt
            se = jnp.where(mixed, (curv - expected) ** 2, 0.0)
            mse = jnp.sum(se) / cnt
            mrse = jnp.sum(se / expected**2) / cnt
            return cmin, cmax, cmean, mse, mrse

        return jax.jit(run)

    fns = {k: metrics_fn(m) for k, m in methods.items()}

    rng = np.random.default_rng(args.seed)
    row = {"iteration": 0, "center-x": 0.0, "center-y": 0.0, "radius": 0.0,
           "cells-per-radius": 0.0, "invert": 0, "expect(curv)": 0.0,
           "init. error": 0.0}
    for k in fns:
        for m in ("min(curv)", "max(curv)", "mean(curv)", "mse(curv)",
                  "mrse(curv)", "runtime [us]"):
            row[f"{k}-{m}"] = 0.0

    mon = Monitor(os.path.join(args.out, "monitor.log"))
    for name in row:
        mon.add_variable(lambda name=name: row[name], name)

    h = min(g.dx, g.dy)
    for it in range(args.iters):
        cx, cy = rng.uniform(-0.65 * s, 0.65 * s, size=2)
        r = rng.uniform(2 * h, 20 * h)
        invert = bool(rng.integers(0, 2))
        while (cx - (r + 2 * g.dx) < -s or cx + (r + 2 * g.dx) > s
               or cy - (r + 2 * g.dy) < -s or cy + (r + 2 * g.dy) > s):
            r /= 2.0

        def inside(x, y):
            d = (x - cx) ** 2 + (y - cy) ** 2 <= r * r
            return ~d if invert else d

        vf = jnp.asarray(liquid_fraction_from_indicator(inside, g))
        expected = (-1.0 if invert else 1.0) / r

        area = float(jnp.sum(vf)) * g.dx * g.dy
        circle = np.pi * r * r
        liquid = (2 * s) ** 2 - circle if invert else circle
        row.update({
            "iteration": it, "center-x": cx, "center-y": cy,
            "radius": -r if invert else r,
            "cells-per-radius": r / h, "invert": int(invert),
            "expect(curv)": expected,
            "init. error": abs(area - liquid) / circle,
        })

        for k, fn in fns.items():
            t0 = time.perf_counter()
            out = jax.device_get(fn(vf, expected))
            dt_us = (time.perf_counter() - t0) * 1e6
            cmin, cmax, cmean, mse, mrse = map(float, out)
            row.update({
                f"{k}-min(curv)": cmin, f"{k}-max(curv)": cmax,
                f"{k}-mean(curv)": cmean, f"{k}-mse(curv)": mse,
                f"{k}-mrse(curv)": mrse, f"{k}-runtime [us]": dt_us,
            })
        mon.write()

    mon.close()
    print(f"wrote {args.iters} trials -> {args.out}/monitor.log")


if __name__ == "__main__":
    main()
