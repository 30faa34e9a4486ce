"""Grid-refinement timing sweep for the single-phase channel.

Re-design of scaling/Channel.cpp:80-356: run the channel at ny = 2^N + 1 for
N in [n_min, n_max], print CSV `level,ny,nx,steps,wall_s,p_iters`.

Usage: python scaling/channel.py [--csv] [--n-min 3] [--n-max 7] [--t-end 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(n_level: int, t_end: float):
    import jax

    from fluidsolver_tpu.core import bc
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.solvers import incomp
    from fluidsolver_tpu.solvers.config import SolverConfig
    from fluidsolver_tpu.solvers.state import init_flow_state

    ny = (1 << n_level) + 1
    nx = 4 * ny
    g = make_grid(0.0, 4.0, nx, 0.0, 1.0, ny)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1.0, visc_gas=1e-3, visc_liquid=1e-3,
        cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=1.0, v=0.0), bc.Neumann(),
            bc.Dirichlet(), bc.Dirichlet(),
        ),
        outflow_correction=True,
    )
    state = init_flow_state(g, 1.0, 1e-3)
    U, V = bc.apply_velocity_bcs(state.U, state.V, g, cfg.bcs)
    import dataclasses

    state = dataclasses.replace(state, U=U, V=V)
    step = incomp.make_step(g, cfg)
    state = step(state, t_end)  # compile
    jax.block_until_ready(state.U)

    t0 = time.perf_counter()
    steps, p_iters = 1, int(state.p_iter)
    while float(state.t) < t_end - 1e-14:
        state = step(state, t_end)
        steps += 1
        p_iters += int(state.p_iter)
    jax.block_until_ready(state.U)
    wall = time.perf_counter() - t0
    return ny, nx, steps, wall, p_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", action="store_true")
    ap.add_argument("--n-min", type=int, default=3)
    ap.add_argument("--n-max", type=int, default=7)
    ap.add_argument("--t-end", type=float, default=5.0)
    args = ap.parse_args()

    if args.csv:
        print("level,ny,nx,steps,wall_s,p_iters")
    for n in range(args.n_min, args.n_max + 1):
        ny, nx, steps, wall, p_iters = run_level(n, args.t_end)
        if args.csv:
            print(f"{n},{ny},{nx},{steps},{wall:.6f},{p_iters}")
        else:
            print(f"N={n}: {nx}x{ny}, {steps} steps in {wall:.3f}s "
                  f"({wall / steps * 1e3:.2f} ms/step), {p_iters} pressure iters")


if __name__ == "__main__":
    main()
