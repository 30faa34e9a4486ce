"""Lid-driven cavity refinement sweep (scaling/LidDrivenFlow.cpp analog).

Usage: python scaling/lid_driven.py [--csv] [--n-min 3] [--n-max 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", action="store_true")
    ap.add_argument("--n-min", type=int, default=3)
    ap.add_argument("--n-max", type=int, default=7)
    ap.add_argument("--t-end", type=float, default=2.0)
    args = ap.parse_args()

    import jax

    from fluidsolver_tpu.cases import get_case

    if args.csv:
        print("level,n,steps,wall_s,p_iters")
    for lvl in range(args.n_min, args.n_max + 1):
        n = (1 << lvl) + 1
        case = get_case("lid_driven", n=n)
        state = case.make_state()
        step = case.make_step()
        state = step(state, args.t_end)
        jax.block_until_ready(state.U)
        t0 = time.perf_counter()
        steps, p_iters = 1, int(state.p_iter)
        while float(state.t) < args.t_end - 1e-14:
            state = step(state, args.t_end)
            steps += 1
            p_iters += int(state.p_iter)
        jax.block_until_ready(state.U)
        wall = time.perf_counter() - t0
        if args.csv:
            print(f"{lvl},{n},{steps},{wall:.6f},{p_iters}")
        else:
            print(f"N={lvl}: {n}^2, {steps} steps in {wall:.3f}s, {p_iters} p-iters")


if __name__ == "__main__":
    main()
