"""Real-TPU validation of the round-4 fused kernels.

  (A) Sparse-advect overlap kernel (vof/pallas_advect.py): vf parity vs
      the XLA clip chain on the same device + wall-clock of both paths.
  (B) Fused PCG init (pallas_cg.step_init + step_c p=None): solve parity
      (solution, iters) vs FS_PALLAS_CG=0, cold and warm start, singular
      and pinned.

Run on the axon TPU: python tools/validate_r4_tpu.py [N]
(tools/validate_rap_tpu.py re-runs the fused-tail check separately.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fluidsolver_tpu  # noqa: F401  (XLA compile cache)
    from bench_suite.common import _drain, time_fn
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import stencil
    from fluidsolver_tpu.vof import advect as adv
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_advect = "--skip-advect" in sys.argv
    n = int(args[0]) if args else 1024
    print("backend:", jax.default_backend(), flush=True)

    # pay the first-D2H stall outside any timed region
    t0 = time.time()
    _drain(jnp.ones((8, 128)) * 2.0)
    print(f"first drain: {time.time() - t0:.1f} s", flush=True)

    # ---- (A) advect overlap kernel --------------------------------------
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    if not skip_advect:
        vf = jnp.asarray(
            liquid_fraction_from_indicator(
                lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.25**2, g),
            jnp.float32)
        U = jnp.full(g.shape_u, 1.0, jnp.float32)
        V = jnp.full(g.shape_v, 0.5, jnp.float32)
        Ui = stencil.interp_u_center(U)
        Vi = stencil.interp_v_center(V)
        dt = 0.25 * g.dx
        rec = plic.elvira(vf, g.dx, g.dy)

        def make_step(mode):
            def f(vf, rec_t, U, V, Ui, Vi):
                old = adv._PALLAS_OVERRIDE
                adv._PALLAS_OVERRIDE = mode  # trace-time switch
                try:
                    out = adv._advect_sparse(
                        vf, plic.Plic(*rec_t), U, V, Ui, Vi, g, dt,
                        adv.default_max_active(n, n))
                finally:
                    adv._PALLAS_OVERRIDE = old
                return out

            return jax.jit(f)

        rec_t = (rec.nx, rec.ny, rec.d, rec.valid, rec.overflow,
                 rec.lane_i, rec.lane_j)
        vf_p, err_p = make_step(None)(vf, rec_t, U, V, Ui, Vi)
        vf_x, err_x = make_step("off")(vf, rec_t, U, V, Ui, Vi)
        dvf = float(jnp.max(jnp.abs(vf_p - vf_x)))
        derr = abs(float(err_p) - float(err_x))
        print(f"[A] advect parity: max|dvf| = {dvf:.3e}  |d vol_err| = {derr:.3e}",
              flush=True)
        assert dvf < 5e-6, "advect kernel parity FAILED"

        for mode, label in ((None, "pallas"), ("off", "xla")):
            f = make_step(mode)
            mean, std = time_fn(lambda *a: f(*a)[0], vf, rec_t, U, V, Ui, Vi)
            print(f"[A] advect[{label}] {n}x{n}: {mean * 1e3:.3f} "
                  f"± {std * 1e3:.3f} ms", flush=True)


    # ---- (B) fused PCG init ---------------------------------------------
    # PHYSICAL circle-jump operator (1000:1 like the production two-phase
    # config) — the random-per-face jump operator has an f32 residual
    # floor above 1e-5 at this size (PERF.md "f32 tolerance parity"), so
    # it cannot separate init regressions from the known floor.
    from fluidsolver_tpu.poisson import cg, linsys

    rng = np.random.default_rng(11)

    def rho_blob(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    rho_u = rho_blob(g.shape_u)
    rho_v = rho_blob(g.shape_v)
    for pin, name in ((None, "singular"), (linsys.PIN_LEFT, "pinned")):
        op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, pin)
        b = jnp.asarray(rng.normal(size=op.aC.shape), jnp.float32)
        singular = pin is None
        if singular:
            b = b - jnp.mean(b)

        def solve(x0=None, flag="1"):
            os.environ["FS_PALLAS_CG"] = flag
            try:
                return cg.solve_pcg(op, b, tol=1e-5, max_iter=100,
                                    singular=singular, precond="boxmg",
                                    x0=x0)
            finally:
                os.environ.pop("FS_PALLAS_CG", None)

        xf, rf, itf = solve()
        xb, rb, itb = solve(flag="0")
        scale = float(jnp.abs(xb).max())
        dx_ = float(jnp.max(jnp.abs(xf - xb))) / scale
        print(f"[B] {name}: fused it={int(itf)} rel={float(rf):.2e} | "
              f"base it={int(itb)} rel={float(rb):.2e} | dx={dx_:.2e}",
              flush=True)
        assert float(rf) < 1e-5 and abs(int(itf) - int(itb)) <= 3
        assert dx_ < 2e-3

        xw, rw, itw = solve(x0=xb * jnp.float32(1.0 + 1e-3))
        print(f"[B] {name} warm: it={int(itw)} rel={float(rw):.2e}",
              flush=True)
        assert float(rw) < 1e-5 and int(itw) < int(itb)

    print("validate_r4_tpu: ALL PASSED", flush=True)


if __name__ == "__main__":
    main()
