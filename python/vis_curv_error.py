"""Curvature-error study summary (python/vis_curv_error.py analog,
/root/reference/python/vis_curv_error.py:1-178).

Consumes the monitor table written by ``tools/curvature_experiment.py``
(random circles, three curvature methods — column scheme
``<method>-{mse,mrse}(curv)`` / ``<method>-runtime [us]``); prints per-
method error statistics and plots binned MRSE vs cells-per-radius.

Usage: python python/vis_curv_error.py <monitor.log> [--save out.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsolver_tpu.io.monitor_parse import read_monitor_file  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("monitor_file")
    ap.add_argument("--save", default=None)
    ap.add_argument("--bins", type=int, default=25)
    args = ap.parse_args()

    df = read_monitor_file(args.monitor_file)
    methods = sorted({c.split("-mse(curv)")[0]
                      for c in df if c.endswith("-mse(curv)")})
    if not methods:
        print("no '<method>-mse(curv)' columns found; columns are:\n  "
              + "\n  ".join(df), file=sys.stderr)
        return 1

    ie = df.get("init. error")
    if ie is not None:
        print(f"init. error: mean={ie.mean():.6e} std={ie.std():.6e}\n")
    for m in methods:
        print(f"{m}:")
        for col in ("mse(curv)", "mrse(curv)"):
            v = df[f"{m}-{col}"]
            print(f"  {col:12s} min={v.min():.4e} max={v.max():.4e} "
                  f"mean={v.mean():.4e} std={v.std():.4e}")
        rt = df.get(f"{m}-runtime [us]")
        if rt is not None:
            print(f"  runtime      mean={rt.mean():.1f}us std={rt.std():.1f}us")
        print("-" * 60)

    cpr = df.get("cells-per-radius")
    if cpr is None:
        return 0
    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    edges = np.linspace(cpr.min(), cpr.max(), args.bins + 1)
    mids = 0.5 * (edges[:-1] + edges[1:])
    fig, ax = plt.subplots(figsize=(8, 5), layout="tight")
    for m in methods:
        v = df[f"{m}-mrse(curv)"]
        binned = [
            v[(cpr >= lo) & (cpr < hi)].mean()
            if ((cpr >= lo) & (cpr < hi)).any() else np.nan
            for lo, hi in zip(edges[:-1], edges[1:])
        ]
        ax.semilogy(mids, binned, marker="o", ms=3, label=m)
    ax.set_xlabel("cells per radius")
    ax.set_ylabel("mean MRSE(curvature)")
    ax.legend()
    ax.grid(alpha=0.3)
    if args.save:
        fig.savefig(args.save, dpi=130)
        print(f"wrote {args.save}")
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
