"""Offline verification: Couette profile from written output
(python/verify_couette_*.py analog).

Usage: python python/verify_couette.py <output_dir> [--u-top 1.0] [--tol 1e-5]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from verify_laminar_channel import load_last_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("--format", choices=["auto", "xdmf", "vtk"], default="auto")
    ap.add_argument("--u-top", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-5)
    args = ap.parse_args()

    x, y, u, _ = load_last_step(args.output_dir, args.format)
    dy = y[1] - y[0]
    y0 = y[0] - dy / 2
    height = (y[-1] + dy / 2) - y0
    u_ana = args.u_top * (y - y0) / height
    worst = 0.0
    for frac in (0.25, 0.5, 0.75):
        i = int(frac * len(x))
        l1 = np.trapezoid(np.abs(u[i, :] - u_ana), y)
        worst = max(worst, l1)
        print(f"x = {x[i]:.3f}: L1(U - linear) = {l1:.6e}")
    if worst > args.tol:
        print(f"FAIL: L1 {worst:.3e} > tol {args.tol:.3e}")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
