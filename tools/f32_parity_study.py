"""f32 tolerance-parity study: production-dtype physics vs f64 truth.

VERDICT r1 weak #3: the reference solves pressure to tol 1e-6
(examples/TwoPhaseSolver.cpp config); the repo's f32 PCG true-residual
floor is ~1e-4 rel, and tolerances below the floor exit via the stagnation
guard. This script quantifies what that floor does to the PHYSICS over the
reference test durations (test/StationaryDrop.cpp:396-412,
test/MovingDrop.cpp:263-380 criteria):

- StationaryDrop (64^2, reference config, t_end = 5.0): volume drift,
  parasitic-current magnitude max|U| (exact solution is quiescent),
  Laplace pressure-jump ratio, achieved pressure-residual floor.
- MovingDrop (64^2 reference-reduced + optional 256^2 reference-exact via
  --full, t_end = 0.5): volume drift, center-of-mass advection error,
  spurious velocity max|U - u_drop|, residual floor.

Runs BOTH dtypes on CPU (f32 on CPU == f32 on TPU up to FMA contraction;
the study isolates dtype, not backend). Writes one JSON line per
(case, dtype) to output/f32_parity.jsonl and prints a summary table.
Results are recorded in PERF.md ("f32 tolerance parity") and pinned by
tests/test_f32_parity.py.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.cases import get_case
from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers import twophase
from fluidsolver_tpu.solvers.config import SolverConfig
from fluidsolver_tpu.utils.diagnostics import center_of_mass


def moving_drop_setup(n, dtype):
    """test/MovingDrop.cpp:18-120: extreme 1e9 density ratio, whole field
    advects at U=1."""
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e9,
        visc_gas=1e-3, visc_liquid=1e-1,
        sigma=1.0 / 20.0, cfl_max=0.5, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(bc.Neumann(), bc.Neumann(), bc.Neumann(), bc.Neumann()),
    )
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.25) ** 2 + (y - 0.5) ** 2 <= 0.05 ** 2, g)
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=dtype)
    flow = state.flow
    U = flow.U.at[:, :].set(jnp.asarray(1.0, flow.U.dtype))
    U, V = bc.apply_velocity_bcs(U, flow.V, g, cfg.bcs)
    state = dataclasses.replace(
        state, flow=dataclasses.replace(flow, U=U, V=V))
    return g, cfg, state


def run_case(name, dtype, full):
    dt = jnp.float32 if dtype == "f32" else jnp.float64
    if name == "stationary_drop":
        case = get_case("stationary_drop", n=64)
        g, cfg = case.grid, case.cfg
        from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator
        vf0 = liquid_fraction_from_indicator(case.vf0, g)
        state = twophase.init_two_phase_state(g, cfg, vf0, dtype=dt)
        t_end, u_ref = 5.0, 0.0
    else:
        n = 256 if full else 64
        g, cfg, state = moving_drop_setup(n, dt)
        t_end, u_ref = 0.5, 1.0

    v0 = float(jnp.sum(state.vf[1:-1, 1:-1])) * g.dx * g.dy
    cx0, cy0 = (float(v) for v in center_of_mass(state.vf, g))
    rec = dict(case=name, dtype=dtype, n=g.nx, t_end=t_end,
               drift_max=0.0, spurious_max=0.0, pres_max=0.0,
               pres_final=0.0, steps=0)
    t0 = time.time()

    def cb(s):
        rec["steps"] += 1
        vol = float(jnp.sum(s.vf[1:-1, 1:-1])) * g.dx * g.dy
        rec["drift_max"] = max(rec["drift_max"], abs(vol - v0) / v0)
        spurious = max(
            float(jnp.max(jnp.abs(s.flow.U - u_ref))),
            float(jnp.max(jnp.abs(s.flow.V))),
        )
        rec["spurious_max"] = max(rec["spurious_max"], spurious)
        pr = float(s.flow.p_res)
        rec["pres_max"] = max(rec["pres_max"], pr)
        rec["pres_final"] = pr

    state = twophase.run(state, t_end, g, cfg, callback=cb)
    cx, cy = (float(v) for v in center_of_mass(state.vf, g))
    rec["t"] = float(state.flow.t)
    rec["wall_s"] = round(time.time() - t0, 1)
    rec["com_err"] = float(np.hypot(cx - (cx0 + u_ref * rec["t"]), cy - cy0))
    rec["vf_min"] = float(jnp.min(state.vf))
    rec["vf_max"] = float(jnp.max(state.vf))
    rec["spurious_final"] = max(
        float(jnp.max(jnp.abs(state.flow.U - u_ref))),
        float(jnp.max(jnp.abs(state.flow.V))))
    if name == "stationary_drop":
        p = np.asarray(state.flow.p, np.float64)
        r_eq = np.sqrt(v0 / np.pi)
        rec["laplace_ratio"] = float(
            (p[33, 33] - p[5, 5]) / (cfg.sigma / r_eq))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="MovingDrop at the reference-exact 256^2 / 1e9")
    ap.add_argument("--cases", default="stationary_drop,moving_drop")
    args = ap.parse_args()

    os.makedirs("output", exist_ok=True)
    rows = []
    for name in args.cases.split(","):
        for dtype in ("f64", "f32"):
            rec = run_case(name, dtype, args.full)
            rows.append(rec)
            with open("output/f32_parity.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)

    print("\n== summary (f32 vs f64) ==")
    for name in args.cases.split(","):
        pair = {r["dtype"]: r for r in rows if r["case"] == name}
        if len(pair) != 2:
            continue
        a, b = pair["f64"], pair["f32"]
        print(f"{name}: drift {a['drift_max']:.2e} -> {b['drift_max']:.2e}; "
              f"spurious {a['spurious_max']:.2e} -> {b['spurious_max']:.2e}; "
              f"p_res floor {a['pres_max']:.2e} -> {b['pres_max']:.2e}; "
              f"com_err {a['com_err']:.2e} -> {b['com_err']:.2e}",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
