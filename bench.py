"""Headline benchmark: full two-phase 1024^2 step time on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md): the driver-imposed north star is a full two-phase
1024^2 step (momentum + Poisson + VOF) in < 10 ms on a v5e chip, so
vs_baseline = 10 ms / measured (>1 is better than target).

Measurement design (the axon TPU sits behind a tunnel — see CLAUDE.md):
- K steps run as ONE dispatch via ``twophase.make_scan_runner`` (lax.scan),
  so per-step host dispatch overhead — the dominant cost in degraded
  tunnel windows — does not contaminate the step time.
- Timing differences a 1-dispatch batch against a 2-dispatch batch (one
  device->host scalar drain each), so the fixed drain/RTT cost cancels.
- The headline is gated on tools/tpu_health.py: degraded windows (sick
  HBM/dispatch) are waited out, and the health line of the window that
  produced the number is recorded in the JSON as "window".
"""

from __future__ import annotations

import json
import os
import sys
import time

N = int(os.environ.get("FS_BENCH_N", "1024"))
STEPS = int(os.environ.get("FS_BENCH_STEPS", "10"))
# develop the flow first so the pressure solve does representative work
# (a quiescent field lets PCG converge in a couple of iterations)
WARMUP = int(os.environ.get("FS_BENCH_WARMUP", "20"))
TARGET_MS = 10.0


def _run(warmup: int, n: int):
    import jax

    # production precision on TPU: f32 fields (f64 is emulated and slow)
    import jax.numpy as jnp

    from fluidsolver_tpu.core import bc
    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.solvers.config import SolverConfig
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=0.5, v=0.0), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
        # loose intermediate subiteration solves (22-23% fewer PCG iters,
        # end state equal to rounding — config.py / PERF.md)
        pressure_tol_intermediate=float(os.environ.get("FS_TOL_INTER", "1e-4")) or None,
        # A/B knobs (bench_suite/ab_matrix.py)
        pressure_precond_dtype=os.environ.get("FS_PRECOND_DTYPE") or None,
        pressure_precond_refresh=os.environ.get("FS_PRECOND_REFRESH", "solve"),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)

    # K steps per dispatch: host dispatch/RTT overhead is paid once per
    # BATCH instead of once per step (VERDICT r1: production runs this way
    # anyway). A scan is one XLA program, so the tunnel never sees an
    # unpaced multi-dispatch queue (which crashes the axon worker).
    runner = twophase.make_scan_runner(g, cfg, STEPS)

    # compile + develop the flow. The drain is a REAL device->host scalar
    # read: block_until_ready can return after the dispatch ack on this
    # tunnel, and the first D2H in a process is sporadically minutes-slow —
    # pay both here, outside the timed region.
    n_warm_batches = max(1, (warmup + STEPS - 1) // STEPS)
    for _ in range(n_warm_batches):
        state = runner(state, 1e9)
        float(state.flow.dt)

    def timed_batch(state, n_dispatches):
        t0 = time.perf_counter()
        for _ in range(n_dispatches):
            state = runner(state, 1e9)
        float(state.flow.dt)  # true completion barrier (D2H read)
        return time.perf_counter() - t0, state

    # Latency-immune timing: difference a 1-dispatch and a 2-dispatch batch
    # (one drain each) — fixed drain cost cancels, leaving STEPS marginal
    # steps + one (async, ~us) enqueue. Median over 3 rounds.
    samples = []
    for _ in range(3):
        t1, state = timed_batch(state, 1)
        t2, state = timed_batch(state, 2)
        samples.append((t2 - t1) / STEPS * 1e3)
    positive = sorted(s for s in samples if s > 0)
    if positive:
        ms = positive[len(positive) // 2]
    else:  # pathological timing noise: fall back to the raw mean
        ms = (t2 / (2 * STEPS)) * 1e3

    # force a device->host read so the result cannot be an enqueue artifact
    checksum = float(jnp.sum(state.flow.p)) + float(jnp.sum(state.vf))

    print(json.dumps({
        "metric": f"two_phase_step_{n}x{n}_ms",
        "value": round(ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(TARGET_MS / ms, 4),
        "p_iter_per_step": int(state.flow.p_iter),
        "cell_updates_per_sec": round(n * n / (ms * 1e-3)),
        "checksum": round(checksum, 3),
        "samples_ms": [round(s, 3) for s in samples],
        "steps_per_dispatch": STEPS,
    }))


def main():
    # The tunneled TPU occasionally drops long dispatch sequences
    # (UNAVAILABLE worker crashes) or hangs; each attempt runs in its own
    # subprocess with a timeout so a wedged/crashed runtime cannot poison
    # the retry at a smaller size. Exactly one JSON line is printed.
    import subprocess

    budget = float(os.environ.get("FS_BENCH_BUDGET_S", "1800"))
    start = time.time()

    # Health gate: the timing above differences two batch sizes and dispatch
    # enqueue is async on this tunnel, so a slow synchronous RTT alone is
    # tolerated ("timeable") — but windows where the DEVICE itself is
    # degraded (~50-60 GB/s effective HBM) would inflate every number ~10x,
    # so those are waited out. tools/tpu_health.py measures rtt / enqueue /
    # effective bandwidth separately and classifies the window.
    last_health = ["unprobed"]

    def healthy() -> bool:
        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "tpu_health.py")],
                capture_output=True, text=True, timeout=600,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            sys.stderr.write(f"health probe: {line}\n")
            last_health[0] = line or "no output"
            return line.startswith(("healthy", "timeable"))
        except Exception as e:
            last_health[0] = f"probe failed ({type(e).__name__})"
            return False

    while not healthy() and time.time() - start < budget * 0.4:
        sys.stderr.write("TPU degraded; waiting 120s for recovery...\n")
        time.sleep(120)

    def run_single(warmup, n, timeout, extra_env=None):
        env = dict(os.environ)
        if extra_env:
            env.update(extra_env)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single",
                 str(warmup), str(n)],
                capture_output=True, text=True, timeout=timeout, env=env,
            )
        except subprocess.TimeoutExpired:
            return None, f"(warmup={warmup}, n={n}) timed out"
        if out.returncode == 0 and out.stdout.strip().startswith("{"):
            return out.stdout.strip().splitlines()[-1], None
        return None, f"(warmup={warmup}, n={n}) failed:\n{out.stderr[-500:]}"

    # Config auto-selection. The fused Pallas kernels are DEFAULT-ON for TPU
    # single-chip since round 2 (fluidsolver_tpu/flags.py), so the canary's
    # job is narrower than round 1: pick the preconditioner refresh policy
    # for THIS window (hierarchy-per-solve is better numerics; per-step is
    # ~10k fewer launches/step at +67% PCG iterations and wins only when the
    # tunnel is launch-bound), and keep an honest all-XLA "base" lane as a
    # regression canary for the Pallas stack itself. Explicitly-set env vars
    # are respected and skip the canary.
    flags = {}
    _base = {"FS_PALLAS_VCYCLE": "0", "FS_PALLAS_MOMENTUM": "0",
             "FS_PALLAS_RAP": "0", "FS_PALLAS_CG": "0"}
    _refresh = {"FS_PRECOND_REFRESH": "step"}
    if (all(os.environ.get(k) is None for k in
            ("FS_PALLAS_VCYCLE", "FS_PALLAS_MOMENTUM", "FS_PRECOND_REFRESH",
             "FS_PALLAS_RAP", "FS_PALLAS_CG"))
            and budget - (time.time() - start) > 1200):
        candidates = [
            ("default", {}),
            ("default+refresh", _refresh),
            ("base", _base),
        ]
        results = {}
        for name, env in candidates:
            js, _ = run_single(5, 256, 300, env)
            try:
                results[name] = json.loads(js)["value"] if js else None
            except Exception:
                results[name] = None
        sys.stderr.write(f"canary 256^2: {results}\n")
        valid = {k: v for k, v in results.items() if v is not None}
        if valid:
            best = min(valid, key=valid.get)
            # 5% hysteresis toward the plain default
            if best != "default" and valid[best] < 0.95 * valid.get(
                    "default", float("inf")):
                flags = dict(candidates[[c[0] for c in candidates].index(best)][1])

    attempts = [(WARMUP, N), (2, N), (2, N // 2), (2, N // 4), (2, N // 8)]
    for k, (warmup, n) in enumerate(attempts):
        remaining = budget - (time.time() - start)
        # leave headroom for at least one fallback attempt
        per_attempt = max(remaining / max(1, (2 - k)), 120.0) if k < 2 else max(remaining, 120.0)
        # re-probe so the JSON records the window that produced the number
        healthy_now = healthy()
        out, err = run_single(warmup, n, per_attempt, flags)
        if out is not None:
            row = json.loads(out)
            if flags:
                row["autoselected"] = flags
            row["window"] = last_health[0]
            row["window_ok"] = bool(healthy_now)
            print(json.dumps(row))
            return
        sys.stderr.write(f"bench attempt {err}\n")
    sys.stderr.write("all bench attempts failed\n")
    raise SystemExit(1)


def _entry():
    if len(sys.argv) == 4 and sys.argv[1] == "--single":
        _run(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()


if __name__ == "__main__":
    _entry()
