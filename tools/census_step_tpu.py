"""TPU-optimized-HLO kernel census of the FULL two-phase step.

Round-3's cost model: ~1520 executed kernels/step at 1024^2 x ~50 us =
the whole timeable-window step time. Wall-clock A/Bs in those windows
have a +-4 ms drain-jitter floor (bench samples), so kernel-count deltas
are the only deterministic attribution for fusion work. This compiles
the production step (bench configuration) and prints the census, with
optional env A/Bs driven by FS_PALLAS_* like the bench.

Usage: [FS_PALLAS_X=0 ...] python tools/census_step_tpu.py [N]
"""

from __future__ import annotations

import os
import re
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("backend:", jax.default_backend(), flush=True)
    # the bench configuration (bench._run)
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=0.5, v=0.0), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
        pressure_tol_intermediate=1e-4,
        pressure_precond_refresh="step",
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g)
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    step = twophase.make_step(g, cfg)

    lowered = jax.jit(step).lower(state, jnp.asarray(1e9, jnp.float32))
    hlo = lowered.compile().as_text()
    fus = len(re.findall(r" fusion\(", hlo))
    cc = len(re.findall(r" custom-call\(", hlo))
    pal = len(re.findall(r'custom_call_target="tpu_custom_call"', hlo))
    srt = len(re.findall(r" sort\(", hlo))
    bc = len(re.findall(r"ConcatBitcast", hlo))
    cpy = len(re.findall(r" copy\(", hlo))
    while_n = len(re.findall(r" while\(", hlo))
    print({"fusions": fus, "custom_calls": cc, "pallas": pal, "sorts": srt,
           "concat_bitcasts": bc, "copies": cpy, "whiles": while_n,
           "static_executed_estimate": fus + (cc - bc) + srt + cpy},
          flush=True)


if __name__ == "__main__":
    main()
