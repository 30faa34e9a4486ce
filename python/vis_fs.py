"""Quick-look field plots from a .npy state dump (python/vis_fs.py analog,
/root/reference/python/vis_fs.py:1-104).

Works on dumps written by ``fluidsolver_tpu.io.npy.save_state_npy`` — both
flat single-phase dumps (``U.npy``) and two-phase dumps with the nested
``flow.`` prefix (``flow.U.npy``); grid coords come from the same directory.

Usage: python python/vis_fs.py <dump_dir> <fields...> [--save out.png]
       fields: velocity | rho | pressure | visc | vf | all
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _load(d, name):
    for cand in (f"{name}.npy", f"flow.{name}.npy"):
        p = os.path.join(d, cand)
        if os.path.exists(p):
            return np.load(p)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump_dir")
    ap.add_argument("fields", nargs="+",
                    help="velocity|rho|pressure|visc|vf|all")
    ap.add_argument("--save", default=None,
                    help="write PNG instead of showing a window")
    args = ap.parse_args()
    want = {f.lower() for f in args.fields}

    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    d = args.dump_dir
    x, y = np.load(os.path.join(d, "x.npy")), np.load(os.path.join(d, "y.npy"))
    xm = np.load(os.path.join(d, "xm.npy"))
    ym = np.load(os.path.join(d, "ym.npy"))

    # panels: (title, array, x-coords, y-coords); staggered fields use the
    # face coordinate on their axis. Arrays carry the 1-cell ghost ring —
    # plot the interior.
    groups = {
        "velocity": [("U", "U", x, ym), ("V", "V", xm, y)],
        "rho": [(r"$\rho^U$", "rho_u", x, ym), (r"$\rho^V$", "rho_v", xm, y)],
        "pressure": [("p", "p", xm, ym),
                     (r"$p_{jump}^U$", "p_jump_u", x, ym),
                     (r"$p_{jump}^V$", "p_jump_v", xm, y)],
        "visc": [(r"$\mu$", "visc", xm, ym)],
        "vf": [("vf", "vf", xm, ym), (r"$\kappa$", "curv", xm, ym)],
    }
    panels = []
    for key, items in groups.items():
        if want & {key, "all", key[0]}:
            for title, name, xc, yc in items:
                a = _load(d, name)
                if a is not None:
                    panels.append((title, a, xc, yc))
    if not panels:
        print(f"no requested fields found in {d}", file=sys.stderr)
        return 1

    fig, axes = plt.subplots(nrows=len(panels),
                             figsize=(8, 3.2 * len(panels)), layout="tight")
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, a, xc, yc) in zip(axes, panels):
        interior = a[1:-1, 1:-1] if a.ndim == 2 else a
        # clip coords to the interior extents (axis 0 = x)
        X, Y = np.meshgrid(xc[: interior.shape[0]],
                           yc[: interior.shape[1]], indexing="ij")
        c = ax.pcolormesh(X, Y, interior)
        fig.colorbar(c, ax=ax)
        ax.set_title(title)
        ax.set_xlabel("$x$")
        ax.set_ylabel("$y$")
    if args.save:
        fig.savefig(args.save, dpi=130)
        print(f"wrote {args.save}")
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
