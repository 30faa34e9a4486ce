"""Cross-step pressure warm-start study (CPU).

Measures total PCG iterations over a run of the rising-bubble case (gravity-
driven developed two-phase flow — the iteration-heavy regime) with the
cross-step warm start (TwoPhaseState.dp_ws seeds subiteration 0's solve with
the previous step's subiteration-0 increment) ON vs OFF.

OFF is emulated by zeroing dp_ws after every step on the host, so both runs
share one compiled step. The reference always cold-starts
(src/LinearSolver_StructHypre.hpp:123-127).
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from fluidsolver_tpu.cases.registry import get_case  # noqa: E402
from fluidsolver_tpu.solvers import twophase  # noqa: E402


def run(case_name: str, n: int, steps: int, cross_step: bool):
    import inspect

    from fluidsolver_tpu.cases import registry as _reg

    kw = next(iter(inspect.signature(_reg._REGISTRY[case_name]).parameters))
    case = get_case(case_name, **{kw: n})
    grid, cfg = case.grid, case.cfg
    state = case.make_state()
    step = twophase.make_step(grid, cfg)
    total = 0
    t0 = time.time()
    for _ in range(steps):
        if not cross_step:
            state = dataclasses.replace(
                state, dp_ws=jnp.zeros_like(state.dp_ws))
        state = step(state, case.t_end)
        total += int(state.flow.p_iter)
    return total, time.time() - t0, float(state.flow.p_res)


def main():
    case_name = sys.argv[1] if len(sys.argv) > 1 else "rising_bubble"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    for label, on in (("cold (dp_ws=0)", False), ("cross-step ws", True)):
        it, wall, res = run(case_name, n, steps, on)
        print(f"{case_name} n={n} steps={steps} {label}: "
              f"total p_iter={it}  wall={wall:.1f}s  final p_res={res:.2e}")


if __name__ == "__main__":
    main()
