"""TPU-optimized-HLO kernel census of the sparse advect paths.

Counts fusions / pallas custom-calls / sorts in the TPU executable of the
pallas-overlap vs XLA-chain sparse advection (and the full
elvira+advect). Launch count is the cost model for the tunnel's timeable
windows (~50 us/executed kernel — PERF.md); wall-clock deltas below the
drain jitter are not trustworthy there, the census is.

Usage: python tools/census_advect_tpu.py [N]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def census(fn, *args):
    import jax

    hlo = jax.jit(fn).lower(*args).compile().as_text()
    fus = len(re.findall(r" fusion\(", hlo))
    cc = len(re.findall(r" custom-call\(", hlo))
    pal = len(re.findall(r'custom_call_target="tpu_custom_call"', hlo))
    srt = len(re.findall(r" sort\(", hlo))
    bitcast_cc = len(re.findall(r"ConcatBitcast", hlo))
    return dict(fusions=fus, custom_calls=cc, pallas=pal, sorts=srt,
                concat_bitcasts=bitcast_cc,
                executed_estimate=fus + (cc - bitcast_cc) + srt)


def main():
    import jax
    import jax.numpy as jnp

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.ops import stencil
    from fluidsolver_tpu.vof import advect as adv
    from fluidsolver_tpu.vof import plic
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("backend:", jax.default_backend(), flush=True)
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
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
    rec_t = (rec.nx, rec.ny, rec.d, rec.valid, rec.overflow,
             rec.lane_i, rec.lane_j)

    def make_step(mode):
        def f(vf, rec_t, U, V, Ui, Vi):
            old = adv._PALLAS_OVERRIDE
            adv._PALLAS_OVERRIDE = mode
            try:
                return adv._advect_sparse(
                    vf, plic.Plic(*rec_t), U, V, Ui, Vi, g, dt,
                    adv.default_max_active(n, n))
            finally:
                adv._PALLAS_OVERRIDE = old

        return f

    for mode, label in ((None, "pallas"), ("off", "xla")):
        c = census(make_step(mode), vf, rec_t, U, V, Ui, Vi)
        print(f"advect[{label}]: {c}", flush=True)


if __name__ == "__main__":
    main()
