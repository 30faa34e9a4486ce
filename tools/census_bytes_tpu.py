"""HBM-traffic census of the compiled 1024^2 step (TPU-optimized HLO).

Round-5 finding (artifacts/ab_matrix_r5.jsonl): cutting 124 real kernels
from the hierarchy build moved the step by +0.007 +- 0.013 ms — the
per-kernel-overhead model (r3/r4) is dead. The surviving hypothesis is
sustained-HBM-bandwidth bound at ~60-65 GB/s effective in "timeable"
windows (the round-1 CLAUDE.md estimate; the axpy health probe reads
~800 GB/s because a single large kernel bursts differently than a
3000-kernel program). Under that model the cost ledger is BYTES, not
kernels: this tool sums, per executed HLO instruction, the unique
operand + output buffer bytes (an upper-ish bound on HBM traffic —
fusion-internal reuse is invisible, alias pairs counted once) and
attributes them to pipeline stages via op_name metadata, like the
census_*_tpu kernel counters do.

Usage: python tools/census_bytes_tpu.py [n] [inner_steps]
Prints a per-stage GB table + GB/step, and the implied ms/step at a few
effective bandwidths.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s64": 8,
               "u64": 8, "c64": 8, "c128": 16}

_SHAPE = re.compile(r"\b([a-z]+\d*|pred)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Sum bytes over every array shape in an HLO type string (handles
    tuples by summing members)."""
    total = 0
    for dt, dims in _SHAPE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# instructions that move/compute real data; everything else (tuple,
# get-tuple-element, parameter, constant, bitcast) is free
_REAL = ("fusion", "custom-call", "copy", "sort", "all-reduce", "all-gather",
         "reduce-scatter", "collective-permute", "convolution", "dot",
         "while", "conditional")


def census(hlo: str):
    """Per-stage (bytes, count) from a TPU-optimized HLO dump.

    Traffic of an instruction = output bytes + operand bytes, where
    operand bytes are estimated from the operand list's shape
    annotations when present (post-optimization HLO prints them);
    while/conditional bodies are counted via their inner instructions
    (the outer op itself is skipped to avoid double counting)."""
    stage_bytes = collections.Counter()
    stage_count = collections.Counter()
    unmatched = collections.Counter()
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?[%\w.\-]+ = (.+?) (\w[\w\-]*)\(", line)
        if not m:
            continue
        out_type, opcode = m.groups()
        if opcode not in _REAL or opcode in ("while", "conditional"):
            continue
        # operand shapes: everything in the argument list before the
        # first attribute — post-opt HLO annotates operand types inline
        args = line[m.end():]
        depth = 1
        for i, ch in enumerate(args):
            depth += (ch == "(") - (ch == ")")
            if depth == 0:
                args = args[:i]
                break
        nbytes = shape_bytes(out_type) + shape_bytes(args)
        om = re.search(r'op_name="([^"]*)"', line)
        name = om.group(1) if om else "?"
        stage = classify(name, opcode)
        stage_bytes[stage] += nbytes
        stage_count[stage] += 1
        if stage == "other":
            unmatched[name[:120]] += nbytes
    return stage_bytes, stage_count, unmatched


def classify(op_name: str, opcode: str) -> str:
    n = op_name.lower()
    for pat, tag in (
        ("build_hierarchy|collapse|galerkin|fused_rap|pack_banded|"
         "pack_transfer|tail_pack|hierarchy", "hierarchy-build"),
        ("solve_pcg|pcg|while|cg_step|step_c|step_init", "pcg-loop"),
        ("v_cycle|fused_smooth|tail_cycle|smooth|restrict|prolong",
         "vcycle"),
        ("advect", "vof-advect"),
        ("elvira|plic|curvature|interface", "vof-geom"),
        ("dmomdt|drhodt|momentum|visc|flux", "momentum"),
        ("apply_velocity_bcs|bc|ghost", "bc"),
        ("assemble|pressure_rhs|linsys|rhs", "poisson-assembly"),
        ("adjust_dt|cfl", "dt"),
    ):
        if re.search(pat, n):
            return tag
    return "other"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax

    from bench_suite.ab_pair import _make_cfg  # the headline config
    import jax.numpy as jnp

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = _make_cfg(n)
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g)
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    runner = twophase.make_scan_runner(g, cfg, inner)
    print("lowering + compiling (cached after first run)...",
          file=sys.stderr, flush=True)
    hlo = jax.jit(runner).lower(state, 1e9).compile().as_text()

    stage_bytes, stage_count, unmatched = census(hlo)
    total = sum(stage_bytes.values())
    print(f"# static traffic census, n={n}, {inner} step(s)/dispatch")
    print(f"{'stage':18s} {'GB':>8s} {'instr':>6s}")
    for stage, b in stage_bytes.most_common():
        print(f"{stage:18s} {b/1e9:8.3f} {stage_count[stage]:6d}")
    print(f"{'TOTAL (static)':18s} {total/1e9:8.3f} "
          f"{sum(stage_count.values()):6d}")
    print("\nNOTE: while-loop bodies are counted ONCE (static); multiply "
          "pcg-loop/vcycle by the measured p_iter and the subiter body "
          "by num_subiter for executed traffic.")
    for bw in (819, 400, 100, 63):
        print(f"implied ms/step at {bw:4d} GB/s (static bytes only): "
              f"{total/1e9/bw*1e3/inner:8.2f}")
    if "--unmatched" in sys.argv:
        print("\n# top 'other' op_names by bytes")
        for name, b in unmatched.most_common(25):
            print(f"{b/1e6:9.1f} MB  {name}")


if __name__ == "__main__":
    main()
