"""Real-TPU A/B of the ONE-launch tail SETUP (FS_PALLAS_TAILSETUP).

Per variant (flag 0/1) a SUBPROCESS (env flags are trace-time, not part of
the jit cache key) runs:
  - a TPU-optimized-HLO kernel census of build_hierarchy at N_CENSUS
    (the round-5 ledger target: 225 -> ~75 real kernels), and
  - a production BoxMG-PCG solve of the 1000:1 drop operator at N_SOLVE
    (tol 1e-6), reporting iters / rel / solution probe values.

The parent compares: iteration count must match within +-1 (the fused
pack's coarse operators differ from galerkin_closed only by comb-probing
association order, ~1e-5 rel in f32 — preconditioner-quality neutral),
and the census must show the sub-tail setup chains gone.

Usage: python tools/validate_tailsetup_tpu.py [N_SOLVE] [N_CENSUS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, re, sys
sys.path.insert(0, %(root)r)
import numpy as np
import jax
import jax.numpy as jnp
import fluidsolver_tpu
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import boxmg, cg, linsys

n_solve, n_census = %(n_solve)d, %(n_census)d

def drop_op(n):
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.45) ** 2 < 0.07, 1000.0, 1.0),
            jnp.float32)
    return linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)

_ = float(jnp.zeros(()) + 1.0)  # first-D2H stall outside everything

# census at n_census
op_c = drop_op(n_census)
hlo = jax.jit(boxmg.build_hierarchy).lower(op_c).compile().as_text()
fus = len(re.findall(r" fusion\(", hlo))
cc = len(re.findall(r" custom-call\(", hlo))
bc = len(re.findall(r"ConcatBitcast", hlo))
srt = len(re.findall(r" sort\(", hlo))
cpy = len(re.findall(r" copy\(", hlo))
census = dict(fusions=fus, pallas_or_cc=cc - bc, sorts=srt, copies=cpy,
              executed_estimate=fus + (cc - bc) + srt + cpy)

# hierarchy structure at n_solve: where does the tail attach, and how
# deep is the level list? (ADVICE r4: a truncated-list re-scan once
# attached a spurious shallow pack at a FINER level that shadowed the
# fused one — the tail start must match the FS_PALLAS_TAILSETUP=0 build)
op = drop_op(n_solve)
levels = boxmg.build_hierarchy(op)
tail_idx = next((i for i, l in enumerate(levels) if l.tail is not None), None)
structure = dict(
    n_levels=len(levels), tail_idx=tail_idx,
    tail_shape=(list(levels[tail_idx].op.aC.shape)
                if tail_idx is not None else None),
    n_tails=sum(1 for l in levels if l.tail is not None),
)

# production solve at n_solve
rng = np.random.default_rng(0)
b = jnp.asarray(rng.normal(size=op.aC.shape), jnp.float32)
b = b - jnp.mean(b)
x, rel, it = cg.solve_pcg(op, b, tol=1e-6, max_iter=200, singular=True,
                          precond="boxmg")
x = x - jnp.mean(x)
print(json.dumps(dict(
    census=census, structure=structure, iters=int(it), rel=float(rel),
    probe=[float(x[7, 11]), float(x[n_solve // 2, n_solve // 2])],
    xmax=float(jnp.abs(x).max()),
)))
"""


def run(flag, n_solve, n_census):
    env = dict(os.environ, FS_PALLAS_TAILSETUP=flag)
    out = subprocess.run([sys.executable, "-c",
                          _CHILD % dict(root=ROOT, n_solve=n_solve,
                                        n_census=n_census)],
                         capture_output=True, text=True, env=env,
                         timeout=1800)
    if out.returncode != 0:
        print(out.stdout)
        print(out.stderr[-4000:])
        raise SystemExit(f"variant FS_PALLAS_TAILSETUP={flag} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_solve = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_census = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    base = run("0", n_solve, n_census)
    fused = run("1", n_solve, n_census)
    print("base :", base)
    print("fused:", fused)
    scale = max(abs(base["xmax"]), 1e-30)
    d_probe = max(abs(a - b) for a, b in zip(base["probe"], fused["probe"]))
    # pass criteria: the fused pack is a preconditioner-quality-neutral
    # (or better) swap — same solution, no iteration REGRESSION beyond
    # f32 trajectory noise (first observed run: base 33 it stagnation-exit
    # at rel 5.4e-6, fused CONVERGED in 26 — comb-probing rounding near
    # the f32 floor changes the trajectory, here for the better) — and
    # the hierarchy census actually shrank (the point of the kernel).
    same_tail = (fused["structure"]["tail_shape"]
                 == base["structure"]["tail_shape"]
                 and fused["structure"]["n_tails"] <= 1)
    ok = (fused["iters"] <= base["iters"] + 2
          and fused["rel"] <= max(1e-5, 2 * base["rel"])
          and d_probe / scale < 1e-3
          and same_tail
          and fused["census"]["executed_estimate"]
          < base["census"]["executed_estimate"])
    print(f"iters {base['iters']} vs {fused['iters']}; census "
          f"{base['census']['executed_estimate']} -> "
          f"{fused['census']['executed_estimate']}; "
          f"probe rel diff {d_probe / scale:.1e}; tail at "
          f"{base['structure']['tail_shape']} vs "
          f"{fused['structure']['tail_shape']} "
          f"(n_tails {fused['structure']['n_tails']})")
    print("PASSED" if ok else "FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
