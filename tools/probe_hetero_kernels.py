"""Isolate WHAT the timeable-window tax is charged on (round-5 forensic).

Facts measured 2026-08-21 (same window, minutes apart):
  - 192 MB axpy chain (1024 identical dispatches): ~800 GB/s
  - 1026² five-point scan (1024 identical in-program kernels): ~840 GB/s
  - the two-phase step (~960 heterogeneous kernels, while-loops, pallas):
    76 ms for ~5 GB  ->  ~65 GB/s apparent
  - paired A/Bs: -124 small kernels = 0.000 ms, +3 p_iter = +7.6 ms,
    refresh=solve (+4 hierarchy builds) = +41 ms

Hypotheses this probe discriminates, all inside ONE jitted program:
  A. identical-kernel scan (baseline; known ~SoL)
  B. alternating two DIFFERENT stencil kernels (program heterogeneity)
  C. scan whose body is a small lax.while_loop (loop-boundary cost)
  D. scan body with a scalar reduction feeding a select (the PCG
     dot->alpha pattern; serialization on scalars)
  E. scan body = one fused_smooth-like pallas call (kernel-internal
     latency) — approximated by the production fused smoother itself on
     a synthetic operator.

Prints one line per variant: name, per-iteration µs, implied GB/s.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

N = 1026
S = int(os.environ.get("FS_PROBE_S", "512"))


def drain(x):
    return float(x.ravel()[0])


def timeit(fn, w, label, bytes_per_iter):
    drain(fn(w))  # compile + warm
    t0 = time.perf_counter()
    z = w
    for _ in range(5):
        z = fn(z)
    drain(z)
    t5 = time.perf_counter() - t0
    t0 = time.perf_counter()
    drain(fn(w))
    t1 = time.perf_counter() - t0
    per = max(t5 - t1, 1e-9) / (4 * S)
    print(f"{label:28s} {per*1e6:9.2f} us/iter  "
          f"{bytes_per_iter/per/1e9:7.1f} GB/s-equiv", flush=True)


def sten_pass(c, coef):
    s = (c
         + coef * jnp.pad(c[1:, :], ((0, 1), (0, 0)))
         + coef * jnp.pad(c[:-1, :], ((1, 0), (0, 0)))
         + coef * jnp.pad(c[:, 1:], ((0, 0), (0, 1)))
         + coef * jnp.pad(c[:, :-1], ((0, 0), (1, 0))))
    return 0.9 * s


def main():
    w = jnp.ones((N, N), jnp.float32)
    bpi = 2 * N * N * 4

    # A: identical kernels
    a = jax.jit(lambda c: lax.scan(
        lambda z, _: (sten_pass(z, 0.25), None), c, None, length=S)[0])
    timeit(a, w, "A identical", bpi)

    # B: two alternating different kernels (different constants AND
    # different structure so XLA cannot canonicalize them together)
    def body_b(z, k):
        z = sten_pass(z, 0.25)
        z = 0.95 * z + 0.05 * jnp.roll(z, 1, axis=1) + 1e-6 * k
        return z, None

    b = jax.jit(lambda c: lax.scan(
        body_b, c, jnp.arange(S, dtype=jnp.float32))[0])
    timeit(b, w, "B heterogeneous pair", 2 * bpi)

    # C: body is a 2-trip while_loop of the stencil
    def body_c(z, _):
        def cond(c2):
            return c2[1] < 2

        def wbody(c2):
            return (sten_pass(c2[0], 0.25), c2[1] + 1)

        return lax.while_loop(cond, wbody, (z, 0))[0], None

    c = jax.jit(lambda c0: lax.scan(body_c, c0, None, length=S)[0])
    timeit(c, w, "C while(2) body", 2 * bpi)

    # D: scalar reduction feeding a select (PCG alpha pattern)
    def body_d(z, _):
        r = jnp.sum(z * z)
        alpha = jnp.where(r > 0, 0.25, 0.1)
        return sten_pass(z, alpha), None

    d = jax.jit(lambda c0: lax.scan(body_d, c0, None, length=S)[0])
    timeit(d, w, "D dot->select body", bpi + N * N * 4)

    # E: the production fused smoother on a synthetic SPD operator
    try:
        from fluidsolver_tpu.poisson import pallas_vcycle as pv
        from fluidsolver_tpu.poisson.linsys import StencilOp

        one = jnp.ones((N, N), jnp.float32)
        op = StencilOp(aC=4.0 * one, aL=-one, aR=-one, aB=-one, aT=-one)

        def body_e(z, _):
            return pv.fused_smooth(op, z, colors=(True, False),
                                   residual=False), None

        e = jax.jit(lambda c0: lax.scan(body_e, c0, None, length=S)[0])
        # fused_smooth reads ~7 planes + b + writes x
        timeit(e, w, "E fused_smooth body", 9 * N * N * 4)
    except Exception as exc:  # pragma: no cover
        print(f"E fused_smooth body          skipped ({type(exc).__name__}: {exc})")


if __name__ == "__main__":
    main()
