"""Shared timing helpers for the micro-benchmarks (bench/ analog)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, *args, reps: int = 20, warmup: int = 3):
    """mean/std wall time of a jitted fn (blocks on the first output leaf)."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.mean(times)), float(np.std(times))


def time_kernel(kernel, carry, inner: int = 50, reps: int = 5):
    """Per-application wall time of ``carry -> carry`` kernel, amortizing
    host-dispatch latency by repeating ``inner`` times inside one jitted
    fori_loop (the TPU here sits behind a tunnel: a single dispatch costs
    ~ms, far more than a small kernel)."""
    import jax
    from jax import lax

    @jax.jit
    def run(c):
        return lax.fori_loop(0, inner, lambda _, c: kernel(c), c)

    out = run(carry)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.mean(times)) / inner, float(np.std(times)) / inner
