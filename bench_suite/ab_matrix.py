"""A/B matrix for the opt-in fused/precision variants, gated on TPU health.

The axon TPU degrades for hours at a time (CLAUDE.md); quantifying the
Pallas kernels in a degraded window is meaningless. This harness loops:
probe health (tools/tpu_health.py) -> if degraded sleep and retry -> if
healthy, run the full variant matrix via ``bench.py --single`` subprocesses
(developed-flow timing, differenced batches) and append JSON lines to
``output/ab_matrix.jsonl``. Each line: {config, n, ms, health} — a health
re-probe after each variant discards rows measured across a degradation
onset.

Variants:
  base            current defaults (XLA sweeps, f32 V-cycle)
  vcycle          FS_PALLAS_VCYCLE=1  (poisson/pallas_vcycle.py)
  momentum        FS_PALLAS_MOMENTUM=1 (ops/pallas_momentum.py)
  both            both Pallas kernels
  bf16            pressure_precond_dtype=bfloat16 (half-traffic V-cycle)
  both+bf16       everything

Usage: python bench_suite/ab_matrix.py [max_hours] (default 6)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "output", "ab_matrix.jsonl")

# decisive comparisons first: short healthy windows should still yield
# the headline-relevant rows before degrading
VARIANTS = [
    ("base", {}),
    ("all-pallas", {"FS_PALLAS_VCYCLE": "1", "FS_PALLAS_MOMENTUM": "1",
                    "FS_PALLAS_RAP": "1", "FS_PALLAS_CG": "1"}),
    ("refresh-step", {"FS_PRECOND_REFRESH": "step"}),
    ("vcycle", {"FS_PALLAS_VCYCLE": "1"}),
    ("rap", {"FS_PALLAS_RAP": "1"}),
    ("cg", {"FS_PALLAS_CG": "1"}),
    ("momentum", {"FS_PALLAS_MOMENTUM": "1"}),
    ("both", {"FS_PALLAS_VCYCLE": "1", "FS_PALLAS_MOMENTUM": "1"}),
    ("vcycle-notail", {"FS_PALLAS_VCYCLE": "1", "FS_PALLAS_TAIL": "0"}),
    ("bf16", {"FS_PRECOND_DTYPE": "bfloat16"}),
    ("both+bf16", {"FS_PALLAS_VCYCLE": "1", "FS_PALLAS_MOMENTUM": "1",
                   "FS_PRECOND_DTYPE": "bfloat16"}),
]
SIZES = [1024, 512]
WARMUP = 20


def probe_health() -> tuple[bool, str]:
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "tpu_health.py")],
            capture_output=True, text=True, timeout=600,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "degraded ? ?"
        # "timeable" (async-cheap dispatch + healthy HBM, only the synchronous
        # tunnel RTT degraded) is sufficient: all measurements here are
        # differenced k/2k-step batches, so fixed drain costs cancel
        return line.startswith(("healthy", "timeable")), line
    except Exception as e:
        return False, f"degraded ({type(e).__name__})"


def run_variant(name, env_extra, n) -> dict | None:
    env = dict(os.environ)
    # kill any inherited A/B flags, then apply this variant's. The Pallas
    # kernels are default-ON for TPU single-chip since round 2
    # (fluidsolver_tpu/flags.py), so "base" must pin them off explicitly.
    for k in ("FS_PRECOND_DTYPE", "FS_PRECOND_REFRESH", "FS_PALLAS_TAIL"):
        env.pop(k, None)
    # (FS_PALLAS_TAIL keeps its own default "1": it only engages when the
    # fused V-cycle is on, and "vcycle"/"both" variants rely on that.)
    for k in ("FS_PALLAS_VCYCLE", "FS_PALLAS_MOMENTUM", "FS_PALLAS_RAP",
              "FS_PALLAS_CG"):
        env[k] = "0"
    env.update(env_extra)
    # r5 protocol: 50-step batches put the per-step noise floor under
    # ~1 ms (drain jitter / STEPS); smaller grids go longer still
    env["FS_BENCH_STEPS"] = "100" if n <= 512 else "50"
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py"), "--single",
             str(WARMUP), str(n)],
            capture_output=True, text=True, timeout=1500, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"config": name, "n": n, "error": "timeout"}
    if out.returncode == 0 and out.stdout.strip().startswith("{"):
        row = json.loads(out.stdout.strip().splitlines()[-1])
        return {"config": name, "n": n, "ms": row["value"],
                "p_iter_per_step": row.get("p_iter_per_step"),
                "samples_ms": row.get("samples_ms"),
                "checksum": row.get("checksum")}
    return {"config": name, "n": n, "error": out.stderr[-300:]}


def main():
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    deadline = time.time() + max_hours * 3600
    os.makedirs(os.path.dirname(OUT), exist_ok=True)

    while time.time() < deadline:
        ok, line = probe_health()
        print(f"[{time.strftime('%H:%M:%S')}] health: {line}", flush=True)
        if not ok:
            time.sleep(300)
            continue
        # healthy window: run the matrix, re-probing between variants
        with open(OUT, "a") as f:
            for n in SIZES:
                for name, env_extra in VARIANTS:
                    if time.time() > deadline:
                        return
                    row = run_variant(name, env_extra, n)
                    ok2, line2 = probe_health()
                    row["health_after"] = line2
                    row["ts"] = time.time()
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(json.dumps(row), flush=True)
                    if not ok2:
                        print("window degraded mid-matrix; pausing", flush=True)
                        break
                else:
                    continue
                break
            else:
                print("matrix complete", flush=True)
                return
    print("deadline reached", flush=True)


if __name__ == "__main__":
    main()
