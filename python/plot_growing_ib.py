"""Expanding-bubble radius-law verification from a monitor log
(python/plot_growing_ib.py analog, /root/reference/python/plot_growing_ib.py:
24-27 — the reference script, despite its name, checks the interfacial-
mass-flux radius law of the ExpandingBubble case).

Law: our ``cfg.phase_change_mdot`` is mass flux PER UNIT INTERFACE LENGTH
(config.py), so dA_gas/dt = m_dot * 2*pi*r / rho_gas gives the LINEAR law
r(t) = r0 + (m_dot/rho_gas) t. (The reference's sqrt(2kt + r0^2) form
follows from its M_DOT being a TOTAL mass rate, plot_growing_ib.py:27 —
same physics, different flux convention.)

Our driver's two-phase monitor logs ``loss(vof)`` (initial liquid integral
minus current). In the fixed domain the gas area gain equals the liquid
area loss (consumption + boundary outflow of the created volume), so
A_gas(t) = pi r0^2 + loss(vof) and the simulated radius follows directly —
no extra monitor channels needed.

Usage: python python/plot_growing_ib.py <monitor.log>
           [--r0 0.15] [--m-dot 0.01] [--rho-gas 1.0] [--save out.png]
(defaults match the ``expanding_bubble`` case registry entry)
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
    ap.add_argument("--r0", type=float, default=0.15)
    ap.add_argument("--m-dot", type=float, default=0.01)
    ap.add_argument("--rho-gas", type=float, default=1.0)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    df = read_monitor_file(args.monitor_file)
    t = df["time"]
    gas_area = np.pi * args.r0**2 + df["loss(vof)"]
    r_sim = np.sqrt(np.maximum(gas_area, 0.0) / np.pi)

    # dA/dt = (2*pi*r) * m_dot / rho_gas  =>  dr/dt = m_dot/rho_gas
    r_exp = args.r0 + (args.m_dot / args.rho_gas) * t

    l1 = np.trapezoid(np.abs(r_sim - r_exp), t) / np.trapezoid(np.abs(r_exp), t)
    rel = abs(r_sim[-1] - r_exp[-1]) / abs(r_exp[-1])
    print(f"radius law: L1 = {l1:.4e}   rel(t={t[-1]:.2f}) = {rel:.4e}")

    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5), layout="tight")
    ax.plot(t, r_sim, label="simulation")
    ax.plot(t, r_exp, "--", label=r"$\sqrt{2kt + r_0^2}$")
    ax.set_xlabel("time")
    ax.set_ylabel("bubble radius")
    ax.legend()
    ax.annotate(f"L1 = {l1:.3e}   rel = {rel:.3e}", xy=(0.05, 0.92),
                xycoords="axes fraction")
    if args.save:
        fig.savefig(args.save, dpi=130)
        print(f"wrote {args.save}")
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
