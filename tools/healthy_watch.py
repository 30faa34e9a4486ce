"""Healthy-window watcher: probe TPU health on a loop; when a HEALTHY
window (rtt < 5 ms — not just "timeable") appears, immediately record the
headline bench + the decisive flag variants into output/healthy_window.jsonl.

Rationale (PERF.md): every recorded 1024^2 number so far comes from
"timeable" windows where step time = executed-kernels x ~0.24 ms and is
launch-bound; the traffic-bound (healthy) number — the one comparable to
BASELINE.md's <10 ms target — has never been observed. This watcher exists
to catch it whenever it happens, unattended.

Usage: python tools/healthy_watch.py [max_hours] (default 12)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "output", "healthy_window.jsonl")

# decisive variants, most important first (short healthy windows should
# still yield the headline row): default = all validated fusions on
VARIANTS = [
    ("default", {}),
    ("dense-vof", {"FS_VOF_MAX_ACTIVE": "0"}),
    ("bf16-precond", {"FS_PRECOND_DTYPE": "bfloat16"}),
    ("no-pallas", {"FS_PALLAS_VCYCLE": "0", "FS_PALLAS_MOMENTUM": "0",
                   "FS_PALLAS_RAP": "0", "FS_PALLAS_CG": "0",
                   "FS_PALLAS_VOF": "0", "FS_PALLAS_TAIL": "0"}),
]


def probe() -> str:
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "tpu_health.py")],
            capture_output=True, text=True, timeout=900,
        )
        return out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "degraded ?"
    except Exception as e:
        return f"degraded ({type(e).__name__})"


def main():
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    deadline = time.time() + max_hours * 3600
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    while time.time() < deadline:
        line = probe()
        print(f"[{time.strftime('%H:%M:%S')}] {line}", flush=True)
        if not line.startswith("healthy"):
            time.sleep(420)
            continue
        # healthy window! record the matrix, re-probing between variants
        with open(OUT, "a") as f:
            for name, extra in VARIANTS:
                env = dict(os.environ)
                env.update(extra)
                env.setdefault("FS_BENCH_STEPS", "10")
                try:
                    out = subprocess.run(
                        [sys.executable, os.path.join(ROOT, "bench.py"),
                         "--single", "20", "1024"],
                        capture_output=True, text=True, timeout=1500, env=env,
                    )
                    row = (json.loads(out.stdout.strip().splitlines()[-1])
                           if out.returncode == 0 and out.stdout.strip()
                           else {"error": out.stderr[-300:]})
                except Exception as e:
                    row = {"error": f"{type(e).__name__}: {e}"[:300]}
                row["config"] = name
                row["window_before"] = line
                line2 = probe()
                row["window_after"] = line2
                row["ts"] = time.time()
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(json.dumps(row), flush=True)
                if not line2.startswith("healthy"):
                    print("window closed mid-matrix; back to watching", flush=True)
                    break
                line = line2
            else:
                print("healthy matrix complete", flush=True)
                return
    print("deadline reached", flush=True)


if __name__ == "__main__":
    main()
