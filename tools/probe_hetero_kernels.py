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


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def probe_vcycle():
    """F: one FULL production BoxMG V-cycle per scan iteration (levels
    built once, closed over) on the 1000:1 drop operator at 1026² —
    does the composite reproduce the ~1.3 ms/iteration the step pays
    (tolinter pair slope) where its parts (probe E ~30 µs/call) do not?
    Run standalone: python tools/probe_hetero_kernels.py vcycle"""
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys

    n = 1024
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    levels = boxmg.build_hierarchy(op)
    w = jnp.zeros(op.aC.shape, jnp.float32).at[13, 17].set(1.0)

    S2 = 64

    def body(z, _):
        return boxmg.v_cycle(levels, z, n_pre=2, n_post=2), None

    f = jax.jit(lambda c: lax.scan(body, c, None, length=S2)[0])
    drain(f(w))
    t0 = time.perf_counter()
    z = w
    for _ in range(5):
        z = f(z)
    drain(z)
    t5 = time.perf_counter() - t0
    t0 = time.perf_counter()
    drain(f(w))
    t1 = time.perf_counter() - t0
    per = max(t5 - t1, 1e-9) / (4 * S2)
    print(f"F full V(2,2) cycle          {per*1e6:9.2f} us/cycle", flush=True)


if "vcycle" in sys.argv and __name__ == "__main__":
    probe_vcycle()


def probe_vcycle_bisect():
    """G/H/I: bisect probe F's 1956 µs/cycle (parts sum to ~300).
    G: cycle on a hierarchy built with FS_PALLAS_TAIL=0 (fused levels
       all the way down + dense coarse inverse, no tail mega-kernel)
    H: the tail kernel alone per iteration (tail_cycle on the 65² pack)
    I: F again with n_pre=n_post=1 (half the smoother calls)
    Run: python tools/probe_hetero_kernels.py bisect"""
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys

    n = 1024
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    w = jnp.zeros(op.aC.shape, jnp.float32).at[13, 17].set(1.0)

    def run_scan(body, w0, S2, label):
        f = jax.jit(lambda c: lax.scan(body, c, None, length=S2)[0])
        drain(f(w0))
        t0 = time.perf_counter()
        z = w0
        for _ in range(5):
            z = f(z)
        drain(z)
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        drain(f(w0))
        t1 = time.perf_counter() - t0
        per = max(t5 - t1, 1e-9) / (4 * S2)
        print(f"{label:28s} {per*1e6:9.2f} us/iter", flush=True)

    # G: no tail
    os.environ["FS_PALLAS_TAIL"] = "0"
    try:
        levels_nt = boxmg.build_hierarchy(op)
    finally:
        os.environ.pop("FS_PALLAS_TAIL", None)
    assert all(l.tail is None for l in levels_nt)
    run_scan(lambda z, _: (boxmg.v_cycle(levels_nt, z, 2, 2), None),
             w, 64, "G cycle, no tail")

    # H: tail kernel alone
    levels = boxmg.build_hierarchy(op)
    tl = next((l for l in levels if l.tail is not None), None)
    if tl is not None:
        from fluidsolver_tpu.poisson import pallas_tail as pt

        wt = jnp.zeros(tl.op.aC.shape, jnp.float32).at[3, 5].set(1.0)
        run_scan(lambda z, _: (pt.tail_cycle(tl.tail, z, 2, 2), None),
                 wt, 256, "H tail_cycle alone")

    # I: full cycle, V(1,1)
    run_scan(lambda z, _: (boxmg.v_cycle(levels, z, 1, 1), None),
             w, 64, "I full cycle V(1,1)")
    # J: full cycle V(2,2) re-baseline in this window
    run_scan(lambda z, _: (boxmg.v_cycle(levels, z, 2, 2), None),
             w, 64, "J full cycle V(2,2)")


if "bisect" in sys.argv and __name__ == "__main__":
    probe_vcycle_bisect()


def probe_smoother_exact():
    """K: the fine-level pre-smoother EXACTLY as v_cycle calls it
    (banded operands, packed transfer planes, restrict epilogue) and
    L: the post-smoother with ec prologue — isolating the in-cycle
    smoother+transfer calls from the remaining glue.
    Run: python tools/probe_hetero_kernels.py exact"""
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    n = 1024
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    levels = boxmg.build_hierarchy(op)
    L0 = levels[0]
    w = jnp.zeros(op.aC.shape, jnp.float32).at[13, 17].set(1.0)
    wc = jnp.zeros(levels[1].op.aC.shape, jnp.float32).at[3, 5].set(1.0)

    S2 = 256

    def run_scan(body, w0, S3, label):
        f = jax.jit(lambda c: lax.scan(body, c, None, length=S3)[0])
        drain(f(w0))
        t0 = time.perf_counter()
        z = w0
        for _ in range(5):
            z = f(z)
        drain(z)
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        drain(f(w0))
        t1 = time.perf_counter() - t0
        per = max(t5 - t1, 1e-9) / (4 * S3)
        print(f"{label:28s} {per*1e6:9.2f} us/iter", flush=True)

    # K: pre-smoother with in-kernel restriction, exactly the cycle call
    def body_k(z, _):
        x, bc = pv.fused_smooth(L0.op, z, colors=(True, False) * 2,
                                tr_planes=L0.tr_fine, restrict=True,
                                banded=L0.banded)
        # consume bc into the fine carry so nothing is DCE'd
        return x + jnp.pad(bc, ((0, z.shape[0] - bc.shape[0]),
                                (0, z.shape[1] - bc.shape[1]))), None

    run_scan(body_k, w, S2, "K pre-smooth+restrict L0")

    # L: post-smoother with ec prologue (ec from the coarse shape)
    ec0 = jnp.zeros(levels[1].op.aC.shape, jnp.float32).at[7, 9].set(1.0)

    def body_l(z, _):
        x = pv.fused_smooth(L0.op, z, x0=z, colors=(False, True) * 2,
                            tr_planes=L0.tr_fine, ec=ec0,
                            banded=L0.banded)
        return x, None

    run_scan(body_l, w, S2, "L post-smooth+prolong L0")

    # M: level-1 pre-smoother (coarse shape 514)
    L1 = levels[1]

    def body_m(z, _):
        x, bc = pv.fused_smooth(L1.op, z, colors=(True, False) * 2,
                                tr_planes=L1.tr_fine, restrict=True,
                                banded=L1.banded)
        return x + jnp.pad(bc, ((0, z.shape[0] - bc.shape[0]),
                                (0, z.shape[1] - bc.shape[1]))), None

    run_scan(body_m, wc, S2, "M pre-smooth+restrict L1")


if "exact" in sys.argv and __name__ == "__main__":
    probe_smoother_exact()


def probe_smoother_knobs():
    """N: which production knob makes fused_smooth 27x slower than bare
    (K=806 µs vs E=30 µs)? Variants at the fine level, colors (T,F)*2:
      N1 bare+4colors          (colors only)
      N2 +banded               (pre-padded operands)
      N3 +residual             (banded, residual epilogue, no transfers)
      N4 +tr_planes restrict   (= K, the full production pre call)
    Run: python tools/probe_hetero_kernels.py knobs"""
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    n = 1024
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    levels = boxmg.build_hierarchy(op)
    L0 = levels[0]
    w = jnp.zeros(op.aC.shape, jnp.float32).at[13, 17].set(1.0)
    S3 = 256

    def run_scan(body, label):
        f = jax.jit(lambda c: lax.scan(body, c, None, length=S3)[0])
        drain(f(w))
        t0 = time.perf_counter()
        z = w
        for _ in range(5):
            z = f(z)
        drain(z)
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        drain(f(w))
        t1 = time.perf_counter() - t0
        per = max(t5 - t1, 1e-9) / (4 * S3)
        print(f"{label:28s} {per*1e6:9.2f} us/iter", flush=True)

    cols = (True, False) * 2
    run_scan(lambda z, _: (pv.fused_smooth(L0.op, z, colors=cols), None),
             "N1 bare 4 colors")
    run_scan(lambda z, _: (pv.fused_smooth(L0.op, z, colors=cols,
                                           banded=L0.banded), None),
             "N2 + banded")

    def body_n3(z, _):
        x, r = pv.fused_smooth(L0.op, z, colors=cols, residual=True,
                               banded=L0.banded)
        return x + r, None

    run_scan(body_n3, "N3 + residual")

    def body_n4(z, _):
        x, bc = pv.fused_smooth(L0.op, z, colors=cols,
                                tr_planes=L0.tr_fine, restrict=True,
                                banded=L0.banded)
        return x + jnp.pad(bc, ((0, z.shape[0] - bc.shape[0]),
                                (0, z.shape[1] - bc.shape[1]))), None

    run_scan(body_n4, "N4 + restrict (production)")


if "knobs" in sys.argv and __name__ == "__main__":
    probe_smoother_knobs()


def probe_unfused_transfers():
    """O: full V(2,2) cycle with tr_fine STRIPPED (banded fused smoothing
    kept, transfers via XLA restrict_box/prolong_box — the v_cycle
    residual branch). N4 showed the in-kernel restrict epilogue costs
    +720 µs/call; if this probe reads ~300-500 µs/cycle (vs F/J's 1960)
    with the same result vector, round-6's first change is to stop
    fusing transfers into the smoother. Run: ... unfused"""
    import dataclasses as dc

    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    n = 1024
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    levels = boxmg.build_hierarchy(op)
    stripped = []
    for l in levels:
        l2 = dc.replace(l) if dc.is_dataclass(l) and not isinstance(l, type) else l
        l2 = boxmg.BoxLevel(op=l.op, red=l.red, tr=l.tr,
                            coarse_inv=l.coarse_inv, tr_fine=None,
                            tail=l.tail,
                            banded=(pv.pack_banded(l.op, None)
                                    if l.banded is not None else None))
        stripped.append(l2)
    w = jnp.zeros(op.aC.shape, jnp.float32).at[13, 17].set(1.0)

    S3 = 64
    for name, lv in (("O cycle, XLA transfers", stripped),
                     ("P cycle, fused transfers", levels)):
        f = jax.jit(lambda c, lv=lv: lax.scan(
            lambda z, _: (boxmg.v_cycle(lv, z, 2, 2), None),
            c, None, length=S3)[0])
        drain(f(w))
        t0 = time.perf_counter()
        z = w
        for _ in range(5):
            z = f(z)
        drain(z)
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        drain(f(w))
        t1 = time.perf_counter() - t0
        per = max(t5 - t1, 1e-9) / (4 * S3)
        print(f"{name:28s} {per*1e6:9.2f} us/cycle", flush=True)
    # numerics: one cycle each, compare
    a = boxmg.v_cycle(stripped, w, 2, 2)
    b = boxmg.v_cycle(levels, w, 2, 2)
    import numpy as np
    dev = float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(b))), 1e-30)
    print(f"rel deviation unfused vs fused transfers: {dev:.2e}", flush=True)


if "unfused" in sys.argv and __name__ == "__main__":
    probe_unfused_transfers()


def probe_consumer_shape():
    """N5/N6: is N4's 806 µs the PALLAS call or its SHAPE-CHANGING XLA
    consumer? Same production pre-call; bc consumed via
      N5: x.at[:nc,:mc].add(bc)   (dynamic-update-slice, fine-shaped)
      N6: jnp.pad(bc) to fine     (the N4/K pattern)
    If N5 collapses to ~N3's 85 µs the kernel is innocent and the fix is
    to emit bc pre-padded. Run: ... consumer"""
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    n = 1024
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    levels = boxmg.build_hierarchy(op)
    L0 = levels[0]
    w = jnp.zeros(op.aC.shape, jnp.float32).at[13, 17].set(1.0)
    S3 = 256
    cols = (True, False) * 2

    def run_scan(body, label):
        f = jax.jit(lambda c: lax.scan(body, c, None, length=S3)[0])
        drain(f(w))
        t0 = time.perf_counter()
        z = w
        for _ in range(5):
            z = f(z)
        drain(z)
        t5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        drain(f(w))
        t1 = time.perf_counter() - t0
        per = max(t5 - t1, 1e-9) / (4 * S3)
        print(f"{label:28s} {per*1e6:9.2f} us/iter", flush=True)

    def body_n5(z, _):
        x, bc = pv.fused_smooth(L0.op, z, colors=cols,
                                tr_planes=L0.tr_fine, restrict=True,
                                banded=L0.banded)
        return x.at[:bc.shape[0], :bc.shape[1]].add(bc), None

    run_scan(body_n5, "N5 restrict, DUS consumer")

    def body_n6(z, _):
        x, bc = pv.fused_smooth(L0.op, z, colors=cols,
                                tr_planes=L0.tr_fine, restrict=True,
                                banded=L0.banded)
        return x + jnp.pad(bc, ((0, z.shape[0] - bc.shape[0]),
                                (0, z.shape[1] - bc.shape[1]))), None

    run_scan(body_n6, "N6 restrict, pad consumer")

    def body_n7(z, _):
        x, bc = pv.fused_smooth(L0.op, z, colors=cols,
                                tr_planes=L0.tr_fine, restrict=True,
                                banded=L0.banded)
        # consume bc through ANOTHER pallas call (the real cycle pattern:
        # bc feeds the next level's fused smoother)
        L1 = levels[1]
        bc2 = jnp.pad(bc, ((0, L1.op.aC.shape[0] - bc.shape[0]),
                           (0, L1.op.aC.shape[1] - bc.shape[1])))
        xc = pv.fused_smooth(L1.op, bc2, colors=cols, banded=L1.banded)
        return x.at[:xc.shape[0], :xc.shape[1]].add(xc), None

    run_scan(body_n7, "N7 restrict -> L1 smoother")


if "consumer" in sys.argv and __name__ == "__main__":
    probe_consumer_shape()
