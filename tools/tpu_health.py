"""TPU health probe for the tunneled axon device.

Prints one line: `<verdict> rtt=<ms> enqueue=<ms> axpy=<GB/s>` with verdict
in {healthy, timeable, degraded}; exit 0 unless degraded.

  rtt      scalar device->host round trip (the tunnel's synchronous cost)
  enqueue  host cost to dispatch one jitted call WITHOUT reading back —
           this, not rtt, is what pollutes differenced batch timings
           (bench.py times k-step and 2k-step batches and subtracts, so
           fixed drain costs cancel but per-dispatch costs scale with k)
  axpy     effective HBM bandwidth of a 3x64MB jitted a+1.5b chain
           (v5e speed-of-light ~819 GB/s; degraded windows measure 50-60)
  stencil  effective bandwidth of PRODUCTION-SIZE (1026², ~4 MB) chained
           five-point passes inside one scan — the traffic class the
           two-phase step is made of. Round-5 finding: windows exist
           where axpy reads ~800 and stencil ~60-100; the step tracks
           the STENCIL number, so compare headline ms against it.

  healthy   rtt < 5 ms and axpy > 500 GB/s      — everything trustworthy
  timeable  enqueue < 2 ms and axpy > 500 GB/s  — device compute is fine and
            dispatch is async-cheap, so DIFFERENCED step timings are valid
            even though synchronous reads crawl (observed windows: rtt
            100-600 ms while the device itself runs at speed-of-light)
  degraded  anything else

Timing drains via device_get (block_until_ready is not a completion barrier
on the tunnel) and differences two batch sizes so fixed latency cancels.
"""

from __future__ import annotations

import sys
import time


def probe():
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform == "cpu":
        # the axon plugin failed to register and JAX silently fell back to
        # CPU: never report a "window" for the wrong device
        raise RuntimeError("no TPU backend (CPU fallback)")

    x = jnp.ones((8, 8))
    float(jnp.sum(x))  # pay the first-transfer cost outside measurements

    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(x * 2))
    rtt_ms = (time.perf_counter() - t0) / 10 * 1e3

    # enqueue cost: dispatch many chained trivial calls, read back ONCE.
    # (t(200) - t(100)) / 100 isolates the per-dispatch host cost from the
    # fixed drain; chaining keeps the device busy-but-bounded.
    g = jax.jit(lambda z: z + 1.0)
    z0 = jnp.ones((128, 128))
    float(g(z0)[0, 0])

    def enq_batch(k):
        t0 = time.perf_counter()
        z = z0
        for _ in range(k):
            z = g(z)
        float(z[0, 0])
        return time.perf_counter() - t0

    e1 = enq_batch(25)
    e2 = enq_batch(50)
    enqueue_ms = max((e2 - e1) / 25, 0.0) * 1e3
    if enqueue_ms > 20.0:
        # dispatch itself is synchronous-and-slow: differenced step timings
        # would be polluted; no point paying for the bandwidth probes
        return rtt_ms, enqueue_ms, 0.0, 0.0

    # Effective-bandwidth probe: ONE batch large enough that device work
    # (SoL ~250 ms at K=1024) dwarfs the RTT jitter of the single drain —
    # differencing small batches is hopeless when the drain jitters by tens
    # of ms. Healthy ≈ 245 µs/axpy (819 GB/s), degraded windows ≈ 10-50x
    # that, so the contrast survives any plausible jitter.
    a = jnp.ones((4096, 4096), jnp.float32)
    b = jnp.ones((4096, 4096), jnp.float32)
    f = jax.jit(lambda z, b: z + 1.5 * b)
    z = f(a, b)
    float(z[0, 0])

    K = 1024
    t0 = time.perf_counter()
    z = a
    for _ in range(K):
        z = f(z, b)
    float(z[0, 0])
    t_batch = time.perf_counter() - t0

    # Production-size sustained probe (round-5 finding): the 192 MB axpy
    # chain can read ~800 GB/s while the SAME window runs 4 MB
    # stencil-size passes at ~60-100 GB/s effective — the degradation the
    # two-phase step actually experiences is invisible to big-kernel
    # probes. One jitted scan of S five-point passes over a 1026² array;
    # ~2 arrays of traffic per pass.
    import jax.numpy as _jnp
    from jax import lax as _lax

    w = _jnp.ones((1026, 1026), _jnp.float32)

    def _pass(c, _):
        s = (c
             + 0.25 * _jnp.pad(c[1:, :], ((0, 1), (0, 0)))
             + 0.25 * _jnp.pad(c[:-1, :], ((1, 0), (0, 0)))
             + 0.25 * _jnp.pad(c[:, 1:], ((0, 0), (0, 1)))
             + 0.25 * _jnp.pad(c[:, :-1], ((0, 0), (1, 0))))
        return 0.9 * s, None

    # S chosen so the differenced signal (4 extra scans ≈ 135 ms at SoL,
    # seconds when degraded) clears the tens-of-ms drain jitter
    S = 1024
    sten = jax.jit(lambda c: _lax.scan(_pass, c, None, length=S)[0])
    float(sten(w)[0, 0])  # compile + warm
    t0 = time.perf_counter()
    z = w
    for _ in range(5):
        z = sten(z)
    float(z[0, 0])
    t5 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(sten(w)[0, 0])
    t1 = time.perf_counter() - t0
    sten_work = max(t5 - t1, 1e-9)  # four extra S-pass scans, drain cancels
    sten_gbs = 4 * S * 2 * 1026 * 1026 * 4 / sten_work / 1e9
    if sten_gbs > 1200.0:
        sten_gbs = 0.0
    # Validity guard: after removing one drain RTT, at least ~100 ms of
    # device work must remain (healthy SoL is ~250 ms at K=1024), or the
    # subtraction is noise (one observed artifact: t_batch ≈ rtt yielded
    # axpy=5e10 GB/s, which the >500 gate read as healthy). An absolute
    # floor — NOT a multiple of rtt — so high-rtt timeable windows (rtt
    # 100-600 ms with the device at speed-of-light) still measure.
    work = t_batch - rtt_ms * 1e-3
    if work < 0.1:
        return rtt_ms, enqueue_ms, 0.0, sten_gbs
    per = work / K
    gbs = 3 * 4096 * 4096 * 4 / per / 1e9
    if gbs > 1200.0:  # above v5e speed-of-light ⇒ measurement artifact
        return rtt_ms, enqueue_ms, 0.0, sten_gbs
    return rtt_ms, enqueue_ms, gbs, sten_gbs


def main():
    try:
        rtt_ms, enqueue_ms, gbs, sten_gbs = probe()
    except Exception as e:  # dead tunnel counts as degraded
        print(f"degraded rtt=nan enqueue=nan axpy=nan stencil=nan "
              f"({type(e).__name__})")
        return 1
    if rtt_ms < 5.0 and gbs > 500.0:
        verdict = "healthy"
    elif enqueue_ms < 2.0 and gbs > 500.0:
        verdict = "timeable"
    else:
        verdict = "degraded"
    print(f"{verdict} rtt={rtt_ms:.2f} enqueue={enqueue_ms:.3f} "
          f"axpy={gbs:.0f} stencil={sten_gbs:.0f}")
    return 0 if verdict != "degraded" else 1


if __name__ == "__main__":
    sys.exit(main())
