"""IB-channel refinement sweeps for all three IB flavors
(scaling/{DiffuseIB,SharpIB,LuchiniIB}Channel.cpp analogs).

Usage: python scaling/ib_channel.py [--mode diffuse|sharp|luchini] [--csv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="diffuse", choices=["diffuse", "sharp", "luchini"])
    ap.add_argument("--csv", action="store_true")
    ap.add_argument("--n-min", type=int, default=3)
    ap.add_argument("--n-max", type=int, default=6)
    ap.add_argument("--t-end", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    from fluidsolver_tpu.cases import get_case

    name = f"{args.mode}_ib_channel"
    if args.csv:
        print("level,ny,steps,wall_s,p_iters")
    for lvl in range(args.n_min, args.n_max + 1):
        ny = (1 << lvl) + 1
        case = get_case(name, ny=ny)
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
            print(f"{lvl},{ny},{steps},{wall:.6f},{p_iters}")
        else:
            print(f"N={lvl}: ny={ny}, {steps} steps in {wall:.3f}s, {p_iters} p-iters")


if __name__ == "__main__":
    main()
