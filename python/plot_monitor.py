"""Plot monitor-table channels over time (python/plot_*.py analog).

Usage: python python/plot_monitor.py <monitor.log> [channel ...]
Writes <monitor.log>.png next to the input (matplotlib optional).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsolver_tpu.io.monitor_parse import read_monitor_file  # noqa: E402


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    path = sys.argv[1]
    data = read_monitor_file(path)
    channels = sys.argv[2:] or [k for k in data if k not in ("time", "dt")]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; printing final values instead:")
        for c in channels:
            print(f"  {c}: {data[c][-1]:.6e}")
        return 0
    fig, axes = plt.subplots(len(channels), 1, figsize=(8, 2.2 * len(channels)), sharex=True)
    if len(channels) == 1:
        axes = [axes]
    for ax, c in zip(axes, channels):
        ax.plot(data["time"], data[c])
        ax.set_ylabel(c)
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("time")
    out = path + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
