"""Kernel-launch (XLA fusion) census of the hot paths, on CPU HLO.

Launch count is the cost model for the tunnel's degraded/timeable windows
(PERF.md): step time ~ launches x 10-50 us there. This prints the fusion
count of each hot piece so launch regressions show up in review. CPU HLO
fusion counts track the TPU counts to the right order of magnitude.

Usage: python tools/launch_count.py [N]   (default 128)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def nfus(fn, *args):
    import jax

    hlo = jax.jit(fn).lower(*args).compile().as_text()
    return len(re.findall(r" fusion\(", hlo))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fluidsolver_tpu.core import bc
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import stencil
    from fluidsolver_tpu.poisson import boxmg, cg, linsys
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.solvers.config import SolverConfig
    from fluidsolver_tpu.vof import advect as adv
    from fluidsolver_tpu.vof import curvature as curv
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g)
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    vf = state.vf
    U, V = state.flow.U, state.flow.V
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)

    print(f"== launch census at N={n} (CPU fusions; XLA default paths) ==")
    print("elvira:          ", nfus(lambda v: plic.elvira(v, g.dx, g.dy), vf))
    rec = plic.elvira(vf, g.dx, g.dy)
    print("vof advect:      ", nfus(
        lambda v, r: adv.advect(v, r, U, V, Ui, Vi, g, 1e-4), vf, rec))
    print("curvature (vm):  ", nfus(
        lambda v, r: curv.curvature_quad_volume_matching(v, r, g), vf, rec))

    rng = np.random.default_rng(0)
    rho_u = jnp.asarray(
        np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0), jnp.float32)
    rho_v = jnp.asarray(
        np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0), jnp.float32)
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    b = jnp.zeros(g.shape_center, jnp.float32)
    print("mg hierarchy:    ", nfus(boxmg.build_hierarchy, op))
    levels = boxmg.build_hierarchy(op)
    print("v_cycle:         ", nfus(boxmg.v_cycle, levels, b))
    print("pcg solve static:", nfus(
        lambda o, r: cg.solve_pcg(o, r, 1e-6, 50, True, "boxmg")[0], op, b))
    step = twophase.make_step(g, cfg)
    print("two-phase step:  ", nfus(step, state, 1e9))


if __name__ == "__main__":
    main()
