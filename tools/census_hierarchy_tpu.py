"""TPU-optimized-HLO kernel census of the BoxMG hierarchy build.

Round-3 counted ~199 executed kernels/step for the once-per-step
hierarchy build at 1024^2 (~6.8 ms in ~50us/kernel windows). This prints
where they live: the full build, one fused_rap level (kernel + unpack),
and pack_banded/pack_transfer — so launch-batching work targets the real
offenders. Usage: python tools/census_hierarchy_tpu.py [N]
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
    bc = len(re.findall(r"ConcatBitcast", hlo))
    cpy = len(re.findall(r" copy\(", hlo))
    return dict(fusions=fus, custom_calls=cc, pallas=pal, sorts=srt,
                concat_bitcasts=bc, copies=cpy,
                executed_estimate=fus + (cc - bc) + srt + cpy)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, linsys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("backend:", jax.default_backend(), flush=True)
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)

    c = census(boxmg.build_hierarchy, op)
    print(f"build_hierarchy[{n}]: {c}", flush=True)

    from fluidsolver_tpu.flags import pallas_enabled

    if pallas_enabled("FS_PALLAS_RAP"):
        from fluidsolver_tpu.poisson import pallas_rap

        c = census(pallas_rap.fused_rap, op)
        print(f"fused_rap[level {n}]: {c}", flush=True)

    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    lvl = boxmg.build_hierarchy(op)[0]
    planes = (lvl.tr_fine if lvl.tr_fine is not None
              else pv.pack_transfer(lvl.tr, lvl.op.aC.shape))
    c = census(lambda o: pv.pack_banded(o, planes), lvl.op)
    print(f"pack_banded[level {n}]: {c}", flush=True)


if __name__ == "__main__":
    main()
