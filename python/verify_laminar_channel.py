"""Offline verification: laminar-channel profile from written output.

Analog of python/verify_laminar_channel_{vtk,xdmf}.py in the reference:
re-derives the L1 profile error against the analytic Poiseuille solution
from a simulation's XDMF/HDF5 (or VTK) output directory.

Usage: python python/verify_laminar_channel.py <output_dir> [--visc 1e-3] [--tol 7.5e-3]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_last_step_h5(output_dir):
    import h5py

    with h5py.File(os.path.join(output_dir, "data.h5"), "r") as f:
        steps = sorted(k for k in f.keys() if k.startswith("step_"))
        grp = f[steps[-1]]
        x = np.asarray(f["grid/x"])
        y = np.asarray(f["grid/y"])
        u = np.asarray(grp["velocity_x"]).T  # stored (ny, nx) Fortran
        p = np.asarray(grp["pressure"]).T
    return x, y, u, p


def load_last_step_vtk(output_dir):
    """VTK-reader variant (reference: verify_laminar_channel_vtk.py /
    verify_couette_vtk.py read the legacy VTK output with the vtk
    package; vtk_reader.py parses our io/vtk.py format with numpy)."""
    from vtk_reader import last_vtk_file, read_structured_grid

    d = read_structured_grid(last_vtk_file(output_dir))
    return (d["x"], d["y"], d["vectors"]["velocity"][..., 0],
            d["scalars"]["pressure"])


def load_last_step(output_dir, fmt="auto"):
    """fmt in {"auto", "xdmf", "vtk"}: auto prefers HDF5, falls back to
    VTK — so both writer formats are verifiable like the reference's
    per-check _vtk/_xdmf script pairs."""
    if fmt == "xdmf":
        return load_last_step_h5(output_dir)
    if fmt == "vtk":
        return load_last_step_vtk(output_dir)
    if os.path.exists(os.path.join(output_dir, "data.h5")):
        return load_last_step_h5(output_dir)
    return load_last_step_vtk(output_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("--format", choices=["auto", "xdmf", "vtk"], default="auto")
    ap.add_argument("--visc", type=float, default=1e-3)
    ap.add_argument("--tol", type=float, default=7.5e-3)
    ap.add_argument("--x-frac", type=float, default=0.7,
                    help="check the profile at this fraction of the channel length")
    args = ap.parse_args()

    x, y, u, p = load_last_step(args.output_dir, args.format)
    dx = x[1] - x[0]
    i = int(args.x_frac * len(x))
    dpdx = (p[i + 1, :] - p[i, :]).mean() / dx
    # analytic profile with the locally measured dp/dx; channel walls at
    # ym +- dy/2 around the stored cell centers
    dy = y[1] - y[0]
    y0, y1 = y[0] - dy / 2, y[-1] + dy / 2
    u_ana = dpdx / (2.0 * args.visc) * (y - y0) * (y - y1)
    l1 = np.trapezoid(np.abs(u[i, :] - u_ana), y)
    print(f"x = {x[i]:.3f}: dpdx = {dpdx:.6e}, L1(U - analytic) = {l1:.6e}")
    if l1 > args.tol:
        print(f"FAIL: L1 {l1:.3e} > tol {args.tol:.3e}")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
