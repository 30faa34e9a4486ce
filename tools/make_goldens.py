"""Generate the committed self-golden trajectories (tests/goldens/*.npz).

Run on CPU in f64 (the truth dtype). Rerun ONLY when a deliberate,
physics-reviewed change to a core op shifts the trajectory — the whole
point of the goldens is that accidental drift fails tests/test_golden.py.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from tests.golden_cases import CASES  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name, make in CASES.items():
        fields = make(dtype=np.float64)()
        arrs = {k: np.asarray(v) for k, v in fields.items()}
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **arrs)
        size = os.path.getsize(path)
        print(f"{name}: t={arrs['t']:.6f}  ->  {path} ({size/1024:.1f} KiB)")
        for k, v in arrs.items():
            if v.ndim:
                print(f"  {k}: {v.shape} |max|={np.abs(v).max():.6e}")


if __name__ == "__main__":
    main()
