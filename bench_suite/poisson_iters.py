"""Developed-flow Poisson iteration study (backend-independent).

Counts PCG iterations per step on a 128^2 two-phase gravity drop (1000:1
density jump) — the dominant cost of the two-phase step. Iteration counts
are a pure algorithm property, so this study runs fine on CPU while the
TPU tunnel is degraded, and is the gate for preconditioner / warm-start
changes (CLAUDE.md perf notes: 9082 -> 746 iters/15 steps history).

Usage: python bench_suite/poisson_iters.py [n] [steps]

Established results on this study (128^2, f32, CPU):
- baseline (BoxMG-PCG, within-step warm-start chain): ~788 iters/15 steps;
  per-subiter split of one developed step: subiter 0 ~5, subiter 1 ~30,
  subiters 2-4 ~5 each (subiter 1's midpoint correction is the big solve).
- cross-step warm start of subiter 0 (seed = previous step's subiter-0
  increment): 864 — WORSE; the first solve is already nearly free.
- per-subiter increment history (seed subiter k with the previous step's
  subiter-k increment): 825 — also no win; increments decorrelate
  step-to-step faster than the within-step chain, and bad seeds spike
  individual solves. Both variants were removed; do not re-add without
  beating the baseline here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from fluidsolver_tpu.core import bc
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.solvers.config import SolverConfig
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    warmup = int(os.environ.get("FS_STUDY_WARMUP", "10"))

    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    wall = bc.Dirichlet(u=0.0, v=0.0)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, gravity=(0.0, -9.81),
        cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=500,
        bcs=bc.FlowBCs(wall, wall, wall, wall),
        pressure_precond_refresh=os.environ.get("FS_PRECOND_REFRESH", "solve"),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.5) ** 2 + (y - 0.7) ** 2 <= 0.15**2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    step = twophase.make_step(g, cfg)

    for _ in range(warmup):
        state = step(state, 1e9)
    iters = []
    for _ in range(steps):
        state = step(state, 1e9)
        iters.append(int(state.flow.p_iter))
    print(f"per-step iters: {iters}")
    print(f"total={sum(iters)} p_res={float(state.flow.p_res):.2e} "
          f"max|U|={float(jnp.max(jnp.abs(state.flow.U))):.3f}")


if __name__ == "__main__":
    main()
