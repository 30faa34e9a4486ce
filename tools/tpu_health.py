"""TPU health probe for the tunneled axon device.

Prints one line: `healthy <lat_ms> <axpy_GBs>` or `degraded <lat_ms> <axpy_GBs>`.
Healthy = scalar round-trip < 5 ms AND effective AXPY bandwidth > 300 GB/s
(v5e speed-of-light ~819 GB/s; degraded windows measure 50-60 GB/s and
100 ms+ dispatch — see CLAUDE.md). Exit code 0 iff healthy.

Timing drains via device_get (block_until_ready is not a completion barrier
on the tunnel) and differences two batch sizes so fixed latency cancels.
"""

from __future__ import annotations

import sys
import time


def probe():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    float(jnp.sum(x))  # pay the first-transfer cost outside measurements

    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(x * 2))
    lat_ms = (time.perf_counter() - t0) / 10 * 1e3

    a = jnp.ones((4096, 4096), jnp.float32)
    b = jnp.ones((4096, 4096), jnp.float32)
    f = jax.jit(lambda z, b: z + 1.5 * b)
    z = f(a, b)
    float(z[0, 0])

    def batch(k):
        t0 = time.perf_counter()
        z = a
        for _ in range(k):
            z = f(z, b)
        float(z[0, 0])
        return time.perf_counter() - t0

    samples = []
    for _ in range(3):
        t1 = batch(20)
        t2 = batch(40)
        samples.append((t2 - t1) / 20)
    per = sorted(samples)[1]
    gbs = 3 * 4096 * 4096 * 4 / per / 1e9 if per > 0 else 0.0
    return lat_ms, gbs


def main():
    try:
        lat_ms, gbs = probe()
    except Exception as e:  # dead tunnel counts as degraded
        print(f"degraded nan nan ({type(e).__name__})")
        return 1
    ok = lat_ms < 5.0 and gbs > 300.0
    print(f"{'healthy' if ok else 'degraded'} {lat_ms:.2f} {gbs:.0f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
