"""Real-TPU validation of the fused BoxMG setup kernel (pallas_rap).

Run in a healthy/timeable window. Checks, on the actual Mosaic backend:
  1. fused_rap compiles and runs at production shapes (512^2 fine, plus
     the coarse 9-point levels, anisotropic channel shapes);
  2. outputs match the XLA path (collapse_weights + galerkin_closed) on
     device to f32 FMA-level tolerances;
  3. wall-clock for one full hierarchy build, fused vs XLA (differenced
     batch timing, scalar-read drains — block_until_ready lies on axon).

Prints one line per check; exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("FS_PALLAS_RAP", "0")  # gate handled manually
    import jax
    import jax.numpy as jnp

    from fluidsolver_tpu.poisson import boxmg, pallas_rap
    from fluidsolver_tpu.poisson.linsys import StencilOp

    if jax.default_backend() != "tpu":
        print("SKIP: not on TPU backend")
        return 0

    rng = np.random.default_rng(0)

    def op5(n, m):
        # SYMMETRIC face-based operator (shared face => aR(i,j)=aL(i+1,j)),
        # random 1000:1 jump coefficients — the structure of the real
        # variable-rho pressure operator. A fully-random nonsymmetric
        # stencil is useless downstream: PCG assumes SPD and the tail's
        # in-kernel coarse sweeps (replacing the dense inverse) are only
        # convergent on M-matrix-like operators.
        kx = rng.random((n + 1, m)) * (1.0 + 999.0 * (rng.random((n + 1, m)) > 0.5)) + 0.1
        ky = rng.random((n, m + 1)) * (1.0 + 999.0 * (rng.random((n, m + 1)) > 0.5)) + 0.1
        aL = -jnp.asarray(kx[:-1, :], jnp.float32)
        aR = -jnp.asarray(kx[1:, :], jnp.float32)
        aB = -jnp.asarray(ky[:, :-1], jnp.float32)
        aT = -jnp.asarray(ky[:, 1:], jnp.float32)
        # homogeneous-Neumann closure at the box edges (no coupling out)
        aL = aL.at[0, :].set(0.0)
        aR = aR.at[-1, :].set(0.0)
        aB = aB.at[:, 0].set(0.0)
        aT = aT.at[:, -1].set(0.0)
        return StencilOp(aC=-(aL + aR + aB + aT), aL=aL, aR=aR, aB=aB, aT=aT)

    failures = 0
    for shape in [(512, 512), (128, 96), (94, 17)]:
        shape_fail0 = failures
        op = op5(*shape)
        tr_ref = jax.jit(boxmg.collapse_weights)(op)
        c_ref = jax.jit(
            lambda o, t: boxmg.galerkin_closed(o, t, o.aC.shape))(op, tr_ref)
        tr, c, _packed = pallas_rap.fused_rap(op)
        for name in ("pW", "pE", "pS", "pN", "pSW", "pSE", "pNW", "pNE"):
            a = np.asarray(getattr(tr, name))
            b = np.asarray(getattr(tr_ref, name))
            ok = np.allclose(a, b, rtol=1e-4, atol=1e-4)
            if not ok:
                failures += 1
                print(f"FAIL {shape} weight {name}: "
                      f"max|d|={np.abs(a - b).max():.3e}")
        for name in ("aC", "aL", "aR", "aB", "aT", "aSW", "aSE", "aNW", "aNE"):
            a = np.asarray(getattr(c, name))
            b = np.asarray(getattr(c_ref, name))
            scale = max(np.abs(b).max(), 1.0)
            ok = np.allclose(a, b, rtol=1e-4, atol=1e-4 * scale)
            if not ok:
                failures += 1
                print(f"FAIL {shape} coarse {name}: "
                      f"max|d|={np.abs(a - b).max():.3e} scale={scale:.1e}")
        print(f"numerics {shape}: "
              f"{'ok' if failures == shape_fail0 else 'FAILED'}")

    # timing: full hierarchy build, differenced batches, scalar drains
    op = op5(512, 512)

    def time_build(flag):
        os.environ["FS_PALLAS_RAP"] = flag
        build = jax.jit(lambda o: boxmg.build_hierarchy(o)[-1].op.aC)
        float(build(op)[0, 0])  # compile + first-transfer

        def batch(k):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                last = build(op)
            float(last[0, 0])
            return time.perf_counter() - t0

        samples = []
        for _ in range(3):
            t1, t2 = batch(5), batch(10)
            samples.append((t2 - t1) / 5 * 1e3)
        pos = sorted(s for s in samples if s > 0)
        return pos[len(pos) // 2] if pos else float("nan")

    ms_xla = time_build("0")
    ms_rap = time_build("1")
    print(f"hierarchy build 512^2: xla={ms_xla:.2f} ms  rap={ms_rap:.2f} ms  "
          f"speedup={ms_xla / ms_rap:.2f}x")

    # fused V-cycle (smoother + in-kernel transfers + coarse-tail kernel)
    # vs the plain XLA cycle: numerics on-device, then differenced timing
    op = op5(512, 512)
    b = jnp.asarray(rng.normal(size=op.aC.shape).astype(np.float32))

    def cycle_fn(flag, tail="1"):
        os.environ["FS_PALLAS_VCYCLE"] = flag
        os.environ["FS_PALLAS_RAP"] = "0"
        os.environ["FS_PALLAS_TAIL"] = tail
        import fluidsolver_tpu.poisson.boxmg as bm

        bm._USE_PALLAS_VC = flag == "1"  # read at import; flip directly
        return jax.jit(lambda o, r: bm.v_cycle(bm.build_hierarchy(o), r))

    # (A) exactness: WITHOUT the coarse tail both paths run the identical
    # cycle (fused smoother + in-kernel transfers are algebraically the
    # same sweeps); they must agree to f32 FMA reassociation noise.
    x_ref = np.asarray(cycle_fn("0")(op, b))
    x_nt = np.asarray(cycle_fn("1", tail="0")(op, b))
    denom = max(np.abs(x_ref).max(), 1e-30)
    dev_nt = np.abs(x_nt - x_ref).max() / denom
    print(f"fused v_cycle(no tail) 512^2: rel_dev={dev_nt:.3e}")
    if not (dev_nt < 1e-4):
        failures += 1
        print("FAIL: fused no-tail v_cycle is not the XLA cycle")

    # (B) quality: WITH the tail the coarsest level runs in-kernel sweeps
    # instead of the dense inverse — an intentional approximation. Judge it
    # the only way that matters: as a PCG preconditioner, iteration count
    # to fixed tolerance must be within ~25% of the base cycle.
    x_fused = np.asarray(cycle_fn("1")(op, b))
    dev = np.abs(x_fused - x_ref).max() / denom
    cos = float(np.sum(x_fused * x_ref)
                / (np.linalg.norm(x_fused) * np.linalg.norm(x_ref) + 1e-30))
    print(f"fused v_cycle(tail) 512^2: rel_dev={dev:.3e} cosine={cos:.6f}"
          " (approximation by design; gated by PCG parity below)")

    from fluidsolver_tpu.poisson import cg as _cg

    # tol/max_iter are chosen so the BASE run converges well inside the
    # budget (asserted below): iteration parity is only a live gate when
    # neither run saturates the cap.
    PCG_TOL, PCG_MAX_ITER = 1e-4, 300

    def pcg_iters(flag):
        # set the full flag set explicitly — do not rely on a preceding
        # cycle_fn call's environment leftovers (ordering hazard)
        os.environ["FS_PALLAS_VCYCLE"] = flag
        os.environ["FS_PALLAS_TAIL"] = flag
        os.environ["FS_PALLAS_RAP"] = "0"
        os.environ["FS_PALLAS_CG"] = "0"
        import fluidsolver_tpu.poisson.boxmg as bm

        bm._USE_PALLAS_VC = flag == "1"
        fn = jax.jit(lambda o, r: _cg.solve_pcg(
            o, r, tol=PCG_TOL, max_iter=PCG_MAX_ITER, singular=True, precond="boxmg"))
        _, res, it = fn(op, b - jnp.mean(b))
        return float(res), int(it)

    res_b, it_b = pcg_iters("0")
    res_f, it_f = pcg_iters("1")
    print(f"PCG w/ precond 512^2: base {it_b}it res={res_b:.2e}  "
          f"fused-tail {it_f}it res={res_f:.2e}")
    if not (it_b < PCG_MAX_ITER):
        failures += 1
        print("FAIL: base PCG saturated max_iter — parity gate is vacuous; "
              "raise PCG_MAX_ITER or loosen PCG_TOL")
    if not (it_f <= max(it_b * 1.25, it_b + 3) and res_f < 2 * max(res_b, PCG_TOL)):
        failures += 1
        print("FAIL: tail cycle degrades PCG convergence")
    if not (cos > 0.999):
        print("note: tail-cycle cosine below 0.999 — acceptable iff PCG "
              "parity above holds")

    def time_cycle(flag):
        fn = cycle_fn(flag)
        float(fn(op, b)[0, 0])

        def batch(k):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                last = fn(op, b)
            float(last[0, 0])
            return time.perf_counter() - t0

        samples = []
        for _ in range(3):
            t1, t2 = batch(5), batch(10)
            samples.append((t2 - t1) / 5 * 1e3)
        pos = sorted(s for s in samples if s > 0)
        return pos[len(pos) // 2] if pos else float("nan")

    ms_c_xla = time_cycle("0")
    ms_c_fused = time_cycle("1")
    print(f"build+cycle 512^2: xla={ms_c_xla:.2f} ms  fused={ms_c_fused:.2f} "
          f"ms  speedup={ms_c_xla / ms_c_fused:.2f}x")

    # fused PCG iteration (FS_PALLAS_CG): full solve numerics + timing
    from fluidsolver_tpu.poisson import cg

    import fluidsolver_tpu.poisson.boxmg as bm
    bm._USE_PALLAS_VC = False
    os.environ["FS_PALLAS_VCYCLE"] = "0"
    bnorm = b - jnp.mean(b)

    def solve_fn(flag):
        os.environ["FS_PALLAS_CG"] = flag
        return jax.jit(lambda o, r: cg.solve_pcg(
            o, r, tol=1e-4, max_iter=60, singular=True, precond="boxmg"))

    x0_, res0, it0 = solve_fn("0")(op, bnorm)
    x1_, res1, it1 = solve_fn("1")(op, bnorm)
    res0, it0 = float(res0), int(it0)
    res1, it1 = float(res1), int(it1)
    dx = float(jnp.max(jnp.abs(x1_ - x0_))) / max(
        float(jnp.max(jnp.abs(x0_))), 1e-30)
    print(f"fused-cg solve 512^2: base res={res0:.2e}/{it0}it "
          f"fused res={res1:.2e}/{it1}it  rel_dx={dx:.2e}")
    # parity with the base PCG (same trajectory to f32 noise), NOT an
    # absolute residual bar: the random-jump stress operator converges
    # slower than any physical pressure operator and that is fine here.
    if not (res1 < 10 * max(res0, 1e-6) and it1 <= it0 + 5 and dx < 1e-2):
        failures += 1
        print("FAIL: fused-cg diverges from base PCG")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
