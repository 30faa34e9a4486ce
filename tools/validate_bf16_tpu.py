"""Real-TPU validation of the bf16-storage fused V-cycle preconditioner.

The round-2 attempt at FS_PRECOND_DTYPE=bfloat16 crashed Mosaic (all-bf16
kernel arithmetic); the round-3 kernel stores operands in bf16 but computes
in f32 with 16-row sublane alignment (pallas_vcycle._make_kernel). This
validates, on the actual Mosaic backend:

  1. the bf16 fused smoother COMPILES and matches the f32-compute oracle
     (upcast operands, XLA sweeps, downcast) to one bf16 ulp;
  2. a full bf16-hierarchy PCG solve (cast_hierarchy: f32 build, bf16
     storage) converges on a 1000:1-jump SPD operator with an iteration
     count close to the f32 hierarchy's;
  3. differenced-batch wall time of the two preconditioned solves (the
     bf16 V-cycle should approach half the f32 V-cycle's HBM traffic).

Run in a healthy/timeable window. Prints one line per check; exits
nonzero on a numeric failure (timing is informational).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("FS_PALLAS_VCYCLE", "1")
    import jax
    import jax.numpy as jnp

    from fluidsolver_tpu.poisson import boxmg, cg, linsys
    from fluidsolver_tpu.poisson import pallas_vcycle as pv
    from fluidsolver_tpu.poisson.linsys import StencilOp

    if jax.default_backend() != "tpu":
        print("SKIP: not on TPU backend")
        return 0

    rng = np.random.default_rng(3)

    def op5(n, m):
        # symmetric face-based 1000:1 jump operator (see validate_rap_tpu)
        kx = rng.random((n + 1, m)) * (1.0 + 999.0 * (rng.random((n + 1, m)) > 0.5)) + 0.1
        ky = rng.random((n, m + 1)) * (1.0 + 999.0 * (rng.random((n, m + 1)) > 0.5)) + 0.1
        aL = -jnp.asarray(kx[:-1, :], jnp.float32)
        aR = -jnp.asarray(kx[1:, :], jnp.float32)
        aB = -jnp.asarray(ky[:, :-1], jnp.float32)
        aT = -jnp.asarray(ky[:, 1:], jnp.float32)
        aL = aL.at[0, :].set(0.0)
        aR = aR.at[-1, :].set(0.0)
        aB = aB.at[:, 0].set(0.0)
        aT = aT.at[:, -1].set(0.0)
        return StencilOp(aC=-(aL + aR + aB + aT), aL=aL, aR=aR, aB=aB, aT=aT)

    failures = 0

    # ---- 1. kernel-level: bf16 fused smoother on Mosaic vs oracle --------
    import dataclasses as dc

    op = op5(256, 256)
    b = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    op16 = dc.replace(op, **{f.name: getattr(op, f.name).astype(jnp.bfloat16)
                             for f in dc.fields(op)})
    b16 = b.astype(jnp.bfloat16)
    try:
        x16, r16 = jax.jit(
            lambda o, bb: pv.fused_smooth(
                o, bb, colors=(True, False, True, False), residual=True)
        )(op16, b16)
        x16, r16 = np.asarray(x16, np.float32), np.asarray(r16, np.float32)
        # oracle: f32 sweeps on upcast operands, downcast
        op32 = dc.replace(op16, **{
            f.name: getattr(op16, f.name).astype(jnp.float32)
            for f in dc.fields(op16)})
        lvl = boxmg.BoxLevel(
            op=op32, red=boxmg._checkerboard((256, 256), jnp.float32), tr=None)
        x_ref = jnp.zeros((256, 256), jnp.float32)
        for _ in range(2):
            x_ref = boxmg._rb_sweep(lvl, x_ref, b16.astype(jnp.float32))
        r_ref = b16.astype(jnp.float32) - linsys.apply_op(op32, x_ref)
        xr = np.asarray(x_ref.astype(jnp.bfloat16), np.float32)
        rr = np.asarray(r_ref.astype(jnp.bfloat16), np.float32)
        ok = (np.allclose(x16, xr, rtol=2**-8, atol=2**-8)
              and np.allclose(r16, rr, rtol=2**-8, atol=2**-7))
        print(f"bf16 fused_smooth on Mosaic: "
              f"{'OK' if ok else 'MISMATCH'} "
              f"max|dx|={np.abs(x16 - xr).max():.3e} "
              f"max|dr|={np.abs(r16 - rr).max():.3e}")
        if not ok:
            failures += 1
    except Exception as e:
        failures += 1
        print(f"bf16 fused_smooth CRASHED Mosaic: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")

    # ---- 2. solve-level: bf16 hierarchy PCG convergence ------------------
    # PHYSICAL drop operator, not the random-jump stress operator: f32 PCG
    # itself cannot reach 1e-6 on the latter (the round-1 "f32 floor" —
    # PERF.md "f32 tolerance parity"), so it cannot separate precond
    # quality from outer-precision limits.
    n = int(os.environ.get("FS_VAL_N", "512"))
    from fluidsolver_tpu.core.grid import make_grid

    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    rho_u = np.where((Xu - 0.5) ** 2 + (Yu - 0.5) ** 2 < 0.25**2, 1e3, 1.0)
    rho_v = np.where((Xv - 0.5) ** 2 + (Yv - 0.5) ** 2 < 0.25**2, 1e3, 1.0)
    op = linsys.assemble_pressure_operator(
        jnp.asarray(rho_u, jnp.float32), jnp.asarray(rho_v, jnp.float32),
        g.dx, g.dy, None)
    b = jnp.asarray(rng.normal(size=op.aC.shape), jnp.float32)
    b = b - jnp.mean(b)  # compatible rhs for the singular operator

    def solve(pd):
        return cg.solve_pcg(op, b, tol=1e-6, max_iter=60, singular=True,
                            precond="boxmg", n_pre=2, n_post=2,
                            precond_dtype=pd)

    sol32 = jax.jit(lambda: solve(None))
    sol16 = jax.jit(lambda: solve(jnp.bfloat16))
    try:
        x32, rel32, it32 = sol32()
        it32 = int(it32); rel32 = float(rel32)
        x16, rel16, it16 = sol16()
        it16 = int(it16); rel16 = float(rel16)
        ok = rel16 <= 1e-5 and it16 <= 2 * it32 + 6
        print(f"PCG {n}^2 1000:1: f32 iters={it32} rel={rel32:.2e} | "
              f"bf16-precond iters={it16} rel={rel16:.2e} "
              f"{'OK' if ok else 'DEGRADED'}")
        if not ok:
            failures += 1
    except Exception as e:
        failures += 1
        print(f"bf16-precond solve CRASHED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")
        return 1

    # ---- 3. timing: differenced batches (see CLAUDE.md: only D2H waits) --
    def timed(fn, reps):
        t0 = time.perf_counter()
        s = None
        for _ in range(reps):
            x, _, _ = fn()
            s = x
        float(jnp.sum(s))  # D2H drain
        return time.perf_counter() - t0

    for name, fn in (("f32", sol32), ("bf16", sol16)):
        fn()  # warm
        t1 = timed(fn, 1)
        t3 = timed(fn, 3)
        print(f"solve wall ({name}): {(t3 - t1) / 2 * 1e3:.2f} ms/solve "
              f"(differenced 1 vs 3 dispatches)")

    print("PASSED" if failures == 0 else f"FAILED ({failures})")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
