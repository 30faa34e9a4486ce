"""Diffuse-IB DFG 2D-1 convergence study (VERDICT r2 #6).

Runs the diffuse-IB cylinder at increasing resolution to quasi-steady
(t=1.5, Re=20) and prints C_D / C_L / dp per level with both evaluators.
Diffuse (volume-fraction penalty) IB smears the cylinder over ~1 cell, so
first-order boundary error is expected: this study measures the actual
trend toward the Schäfer–Turek band (C_D 5.57-5.59, dp 0.1172-0.1176)
so tests/test_dfg.py can pin resolution-appropriate bands instead of the
round-2 ±40% non-band.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from fluidsolver_tpu.cases import dfg, get_case  # noqa: E402


def run_level(ny: int, t_end: float = 1.5, max_steps: int = 4000):
    case = get_case("diffuse_ib_dfg", ny=ny, benchmark=1)
    g = case.grid
    state = case.make_state()
    step = case.make_step()
    t0 = time.time()
    n = 0
    while float(state.t) < t_end and n < max_steps:
        state = step(state, t_end)
        n += 1
    um = dfg.u_mean(1, float(state.t))
    cd = float(dfg.calc_c_d(state.p, state.U, g, um))
    cds = float(dfg.calc_c_d_surface(state.p, state.U, state.V, g, um))
    cls = float(dfg.calc_c_l_surface(state.p, state.U, state.V, g, um))
    dp = float(dfg.calc_p_diff(state.p, g))
    print(f"ny={ny:4d} steps={n:5d} t={float(state.t):.3f} "
          f"C_D(row)={cd:.4f} C_D(surf)={cds:.4f} C_L(surf)={cls:.5f} "
          f"dp={dp:.5f}  wall={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [48, 64, 96, 128]
    for ny in levels:
        run_level(ny)
