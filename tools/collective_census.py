"""Collective census of the production multi-chip step (VERDICT r2 #5).

Compiles the sharded multi-step scan runner (twophase.make_scan_runner
(mesh=...)) on an n-device virtual CPU mesh, walks the OPTIMIZED HLO, and
prints one line per collective kind with counts and the largest transfer
shapes — the communication analog of tools/launch_count.py.

The specific risk this hunts: GSPMD silently inserting an all-gather that
materializes a FULL global field on every device (e.g. around the sparse
VOF gather/scatter or the BoxMG hierarchy), turning domain decomposition
into replication. Any all-gather whose output byte size is >= the full
global field is flagged LOUDLY.

Accounting is split by where the collective lives:

- PER-STEP (inside the scan while-body): executed every step — the numbers
  that matter for sustained throughput. Must contain NO full-field
  all-gathers. (The distributed BoxMG coarse TAIL does small subgroup
  all-gathers by design — parallel/dist_poisson.py gathers the coarsest
  levels to run them replicated; those are far below the full-field line.)
- BOUNDARY (outside the loop): the one-time jit entry/exit reshard. The
  simulation state (67-row staggered boxes) cannot be stored NamedSharding-
  sharded at rest (row counts are not divisible by the mesh), so results
  are materialized replicated ONCE per run_n call. Reported, not flagged.

History (n=64, 8-dev): 20 per-step full-field all-gathers at round-2 HEAD
-> 0 after (a) scatter-free interior/edge writes (core/fields.set_interior,
iota+where), (b) gather-free dense RK4 backtrace sampling
(ops/stencil.sample_centered_stack_lattice), (c) sharding-pinned pads at
the interior->box grow (vof/advect) and the dist-solver row pad
(parallel/dist_poisson.solve_pcg_sharded).

Usage:  python tools/collective_census.py [n_devices] [n_grid] [n_steps]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KINDS = ("all-gather", "all-reduce", "collective-permute",
         "reduce-scatter", "all-to-all")

_WIDTH = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
          "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
        if dt not in _WIDTH:
            continue
        nelem = 1
        for d in dims.split(","):
            if d:
                nelem *= int(d)
        total += nelem * _WIDTH[dt]
    return total


def walk(hlo: str):
    """Yield (computation, kind, bytes, line) for every collective."""
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+)\s*\([^)]*\)\s*->", line)
        if m and not line.startswith(" "):
            cur = m.group(1)
        s = line.strip()
        m = re.match(r"(?:ROOT )?\S+ = (\S+) (all-gather|all-reduce|"
                     r"collective-permute|reduce-scatter|all-to-all)", s)
        if m:
            yield cur, m.group(2), shape_bytes(m.group(1)), s


def main(n_devices: int = 8, n: int = 64, n_steps: int = 4):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    import __graft_entry__ as ge
    from fluidsolver_tpu.solvers import twophase

    g, cfg, state, _ = ge._flagship(n=n)
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("x",))
    run_n = twophase.make_scan_runner(g, cfg, n_steps=n_steps, mesh=mesh)
    hlo = run_n.lower(state, 1.0).compile().as_text()

    rows = list(walk(hlo))
    # the scan body = the non-entry computation holding the most collectives
    # (the per-step while body); everything in the ENTRY computation is the
    # one-time jit boundary. Inner computations called FROM the body (PCG
    # while, V-cycle) also count as per-step.
    entry = None
    for line in hlo.splitlines():
        m = re.match(r"ENTRY %?([\w.\-]+)", line)
        if m:
            entry = m.group(1)
            break

    full_bytes = state.flow.p.size * state.flow.p.dtype.itemsize
    print(f"# collective census: {n_devices}-device x-slab mesh, n={n}, "
          f"{n_steps}-step scan (full center field = {full_bytes/1e6:.2f} MB)")

    flagged = 0
    for scope, pred in (("PER-STEP (scan body + solver loops)",
                         lambda c: c != entry),
                        ("BOUNDARY (one-time jit entry/exit)",
                         lambda c: c == entry)):
        print(f"\n== {scope}")
        for k in KINDS:
            sel = [(b, s) for c, kk, b, s in rows if kk == k and pred(c)]
            if not sel:
                print(f"{k:20s}: 0")
                continue
            sel.sort(reverse=True)
            big = sum(1 for b, _ in sel if b >= full_bytes)
            print(f"{k:20s}: {len(sel):4d}   max {sel[0][0]/1e6:8.3f} MB   "
                  f">=full-field: {big}   "
                  f"total {sum(b for b, _ in sel)/1e6:.3f} MB")
            for b, src in sel[:4]:
                meta = re.search(r'op_name="([^"]*)"', src)
                label = meta.group(1)[-100:] if meta else src[:100]
                print(f"    {b/1e6:8.3f} MB  {label}")
            if k == "all-gather" and "PER-STEP" in scope:
                flagged = big
    if flagged:
        print(f"\nFLAG: {flagged} PER-STEP all-gather(s) materialize >= a "
              f"full global field — replication, not decomposition. Inspect.")
        return 1
    print("\nOK: no per-step full-field all-gathers; decomposition holds.")
    return 0


if __name__ == "__main__":
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ng = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ns = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    raise SystemExit(main(nd, ng, ns))
