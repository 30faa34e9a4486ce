"""Real-TPU validation of the dense Pallas ELVIRA (strict f32 Mosaic path).

Checks, against the sparse XLA path on the same device:
  (A) valid masks identical;
  (B) the chosen planes are equally optimal (ELVIRA 3x3 reproduction error
      matches to f32 rounding — invariant under near-tie candidate flips);
  (C) winner agreement on >= 99% of mixed cells;
  (D) wall-clock of both paths (fori-batched, outputs consumed).

Run on the axon TPU: python tools/validate_vof_tpu.py [N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fluidsolver_tpu  # noqa: F401  (XLA compile cache)
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.vof import pallas_elvira as pe
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    g = make_grid(0.0, 1.0, n, 0.0, 1.3, n)
    vf = jnp.asarray(liquid_fraction_from_indicator(
        lambda x, y: (x - 0.45) ** 2 + (y - 0.62) ** 2 <= 0.27 ** 2, g),
        jnp.float32)
    print("backend:", jax.default_backend(), flush=True)

    sparse = jax.jit(lambda v: plic._elvira_sparse(v, g.dx, g.dy,
                                                   plic.default_max_mixed(n, n)))
    dense = jax.jit(lambda v: pe.elvira_pallas(v, dx=g.dx, dy=g.dy))

    ref = jax.device_get(sparse(vf))
    got = jax.device_get(dense(vf))

    ok = True
    same_valid = bool((np.asarray(ref.valid) == np.asarray(got.valid)).all())
    print("(A) valid masks identical:", same_valid, flush=True)
    ok &= same_valid

    def fit_err(rec):
        nx_, ny_, d_ = (jnp.asarray(np.asarray(a)[1:-1, 1:-1], jnp.float64)
                        for a in (rec.nx, rec.ny, rec.d))
        err = jnp.zeros_like(d_)
        for di, dj in plic._NEIGHBOR_OFFSETS:
            d_n = d_ - (nx_ * di * g.dx + ny_ * dj * g.dy)
            pred = plic.area_fraction(nx_, ny_, d_n, g.dx, g.dy)
            vfn = jnp.asarray(np.asarray(plic._shift(vf, di, dj)), jnp.float64)
            err = err + (pred - vfn) ** 2
        return np.asarray(err)

    v = np.asarray(ref.valid)[1:-1, 1:-1]
    e_ref, e_got = fit_err(ref)[v], fit_err(got)[v]
    # f32 winners scored in f64: rounding of the f32 candidate values leaves
    # ~1e-6-scale error differences on near-ties; anything larger means a
    # genuinely missed candidate
    derr = np.abs(e_got - e_ref).max() if v.any() else 0.0
    print(f"(B) max |fit-err difference| = {derr:.3e} (gate 5e-5)", flush=True)
    ok &= derr < 5e-5
    same = np.isclose(np.asarray(got.d)[1:-1, 1:-1][v],
                      np.asarray(ref.d)[1:-1, 1:-1][v], rtol=1e-5, atol=1e-7)
    frac = float(same.mean()) if v.any() else 1.0
    print(f"(C) winner agreement: {frac:.4f} (gate 0.99)", flush=True)
    ok &= frac > 0.99

    # (B2) curvature: dense Pallas vs the sparse XLA fit (values agree to
    # f32 rounding; the kernel's rotation is trig-free — see module doc)
    from fluidsolver_tpu.core.grid import Grid  # noqa: F401
    from fluidsolver_tpu.vof import curvature as cv
    from fluidsolver_tpu.vof import pallas_curvature as pcur

    ref_c = jax.device_get(jax.jit(lambda: cv._curvature_vm_sparse(
        vf, got if same_valid else ref, g, plic.default_max_mixed(n, n)))())
    got_c = jax.device_get(jax.jit(lambda: pcur.curvature_vm_pallas(
        got.nx, got.ny, got.d, got.valid, dx=g.dx, dy=g.dy))())
    vmask = np.asarray(got.valid)
    dc = np.abs(np.asarray(got_c)[vmask] - np.asarray(ref_c)[vmask])
    scale = max(1.0, np.abs(np.asarray(ref_c)).max())
    print(f"(B2) curvature max |diff| = {dc.max() if vmask.any() else 0:.3e}"
          f" (scale {scale:.1f}, gate 1e-3*scale)", flush=True)
    ok &= (not vmask.any()) or dc.max() < 1e-3 * scale

    # (D) timing: fori-batched, everything consumed
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_suite"))
    from common import time_kernel

    def run_sparse(c):
        r = plic._elvira_sparse(c, g.dx, g.dy, plic.default_max_mixed(n, n))
        return c + (jnp.sum(r.nx) + jnp.sum(r.ny) + jnp.sum(r.d)) * 0.0

    def run_dense(c):
        r = pe.elvira_pallas(c, dx=g.dx, dy=g.dy)
        return c + (jnp.sum(r.nx) + jnp.sum(r.ny) + jnp.sum(r.d)) * 0.0

    def run_curv_sparse(c):
        rec = plic._elvira_sparse(c, g.dx, g.dy, plic.default_max_mixed(n, n))
        return c + jnp.sum(cv._curvature_vm_sparse(
            c, rec, g, plic.default_max_mixed(n, n))) * 0.0

    def run_curv_pallas(c):
        rec = pe.elvira_pallas(c, dx=g.dx, dy=g.dy)
        return c + jnp.sum(pcur.curvature_vm_pallas(
            rec.nx, rec.ny, rec.d, rec.valid, dx=g.dx, dy=g.dy)) * 0.0

    for name, fn in [("sparse", run_sparse), ("pallas", run_dense),
                     ("curv_sparse", run_curv_sparse),
                     ("curv_pallas", run_curv_pallas)]:
        ms, sp = time_kernel(fn, vf, inner=20, reps=3)
        print(f"(D) {name}: {ms*1e3:.3f} ms (+-{sp*1e3:.3f})", flush=True)

    print("VALIDATE_VOF:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
