"""Shared timing helpers for the micro-benchmarks (bench/ analog).

Measurement model for the tunneled axon TPU backend:

- ``jax.block_until_ready`` can return BEFORE the device finishes (the
  tunnel acks the dispatch, not the completion), so individually-timed
  dispatches read bogus-fast. A device->host copy of an output leaf is the
  only reliable barrier: the bytes cannot arrive before the producing
  executable has run.
- Dispatch latency and the drain copy's transfer time are therefore part of
  any wall-clock sample. Both are removed by differencing two batch sizes
  (N and 2N dispatches): the fixed costs cancel in the slope.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _drain(out):
    """Force a real completion barrier: block_until_ready alone is not one
    on the axon tunnel."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf)


def _two_point(timed, n1: int, n2: int, samples: int = 3):
    """Per-iteration time from the slope between batch sizes n1 < n2; the
    min over samples rejects scheduling noise."""
    t1 = [timed(n1) for _ in range(samples)]
    t2 = [timed(n2) for _ in range(samples)]
    per = (min(t2) - min(t1)) / (n2 - n1)
    spread = (np.std(t2) + np.std(t1)) / (n2 - n1)
    return float(max(per, 0.0)), float(spread)


def time_fn(fn, *args, reps: int = 20, warmup: int = 3):
    """mean/std wall time per application of a jitted fn."""
    out = fn(*args)
    _drain(out)  # compile + first-transfer warmup
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)

    def timed(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _drain(o)
        return time.perf_counter() - t0

    return _two_point(timed, reps, 2 * reps)


def time_kernel(kernel, carry, inner: int = 50, reps: int = 5):
    """Per-application wall time of a ``carry -> carry`` kernel, amortizing
    host-dispatch latency inside one jitted fori_loop with a trip-count
    argument (one executable, two batch sizes, same cancellation)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(c, n):
        return lax.fori_loop(0, n, lambda _, c: kernel(c), c, unroll=False)

    for n in (jnp.int32(inner), jnp.int32(2 * inner)):
        _drain(run(carry, n))  # compile both trip counts

    def timed(n):
        t0 = time.perf_counter()
        o = run(carry, jnp.int32(n))
        _drain(o)
        return time.perf_counter() - t0

    per, spread = _two_point(timed, inner, 2 * inner, samples=reps)
    return per, spread
