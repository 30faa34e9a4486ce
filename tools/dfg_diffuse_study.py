"""Diffuse-IB DFG 2D-1 convergence study (VERDICT r2 #6, r3 #5).

Runs the diffuse-IB cylinder at increasing resolution to steady state and
prints C_D / C_L / dp per level with both evaluators. Diffuse
(volume-fraction penalty) IB smears the cylinder over ~1 cell, so
first-order boundary error is expected; this study measures the actual
trend toward the Schäfer–Turek band (C_D 5.57-5.59, dp 0.1172-0.1176).

Round-3 lesson: the r2 study stopped at t=1.5 — DFG 2D-1 is a STEADY
benchmark and the reference integrates to T_END = 8.0
(examples/DFGBenchmarkSetup.hpp:38); at t=1.5 the impulsive-start drag
transient is still decaying, which is what produced the non-monotone
per-resolution values test_dfg.py used to document. This version runs to
t=8.0 (override via --t-end) and prints an intermediate readout at t=4
so steadiness is visible.

Usage: python tools/dfg_diffuse_study.py [--tpu] [--t-end 8.0] [ny ...]
CPU by default (f32); --tpu runs on the real chip (much faster at
ny>=128). Solid fractions are already quadrature-exact
(ib/diffuse.solid_fractions, 16-pt Gauss — reference
examples/DiffuseIB.cpp:222-238).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def run_level(ny: int, t_end: float, max_steps: int = 100_000,
              dtype=None):
    import jax.numpy as jnp

    from fluidsolver_tpu.cases import dfg, get_case

    case = get_case("diffuse_ib_dfg", ny=ny, benchmark=1)
    g = case.grid
    state = case.make_state(dtype=dtype or jnp.float32)
    step = case.make_step()
    t0 = time.time()
    n = 0

    def readout(tag):
        import jax.numpy as jnp

        um = dfg.u_mean(1, float(state.t))
        umax = float(jnp.max(jnp.abs(state.U)))
        cd = float(dfg.calc_c_d(state.p, state.U, g, um))
        cds = float(dfg.calc_c_d_surface(state.p, state.U, state.V, g, um))
        cls = float(dfg.calc_c_l_surface(state.p, state.U, state.V, g, um))
        dp = float(dfg.calc_p_diff(state.p, g))
        print(f"ny={ny:4d} {tag} steps={n:6d} t={float(state.t):.3f} "
              f"C_D(row)={cd:.4f} C_D(surf)={cds:.4f} C_L(surf)={cls:.5f} "
              f"dp={dp:.5f} max|U|={umax:.4f}  wall={time.time()-t0:.0f}s",
              flush=True)

    for frac, tag in ((0.25, "t/4   "), (0.5, "mid   "), (0.75, "3t/4  "),
                      (1.0, "steady")):
        tcut = frac * t_end
        while float(state.t) < tcut and n < max_steps:
            state = step(state, tcut)
            n += 1
        readout(tag)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a not in ("--tpu", "--f64")]
    t_end = 8.0
    if "--t-end" in argv:
        i = argv.index("--t-end")
        t_end = float(argv[i + 1])
        del argv[i:i + 2]
    levels = [int(a) for a in argv] or [48, 64, 96, 128, 192, 256]
    dtype = None
    if "--f64" in sys.argv:
        import fluidsolver_tpu

        fluidsolver_tpu.enable_x64()
        import jax.numpy as jnp

        dtype = jnp.float64
    for ny in levels:
        run_level(ny, t_end, dtype=dtype)
