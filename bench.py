"""Headline benchmark: full two-phase 1024^2 step time on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the driver-imposed north star is a full two-phase
1024^2 step (momentum + Poisson + VOF) in < 10 ms on a v5e chip, so
vs_baseline = 10 ms / measured (>1 is better than target).
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
        # A/B knobs (bench_suite/ab_matrix.py)
        pressure_precond_dtype=os.environ.get("FS_PRECOND_DTYPE") or None,
        pressure_precond_refresh=os.environ.get("FS_PRECOND_REFRESH", "solve"),
    )
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g
    )
    state = twophase.init_two_phase_state(g, cfg, vf0, dtype=jnp.float32)
    step = twophase.make_step(g, cfg)

    # compile + develop the flow. Chunked REAL drains (scalar reads) keep
    # the tunneled TPU stable: block_until_ready does not pace (it acks the
    # dispatch, not completion) and an unpaced multi-step queue crashes the
    # axon worker with UNAVAILABLE.
    for k in range(warmup):
        state = step(state, 1e9)
        if k % 2 == 1:
            float(state.flow.dt)
    # real completion barrier + first-transfer warmup: block_until_ready can
    # return BEFORE the device finishes on the axon tunnel (it acks the
    # dispatch); only a device->host read is a true barrier, and the first
    # one in a process is sporadically minutes-slow — pay it here, not in
    # the timed region.
    float(state.flow.dt)

    # Latency-immune timing: the tunneled TPU's host<->device round trip
    # degrades sporadically from ~1 ms to >100 ms, which would swamp a
    # single timed batch. Time a K-step batch and a 2K-step batch (one
    # drain each) and difference them — the fixed dispatch/drain cost
    # cancels, leaving the marginal on-device step time. Median over 3
    # rounds. The drain is a scalar device->host read, NOT
    # block_until_ready (see above).
    def timed_batch(state, k):
        t0 = time.perf_counter()
        for _ in range(k):
            state = step(state, 1e9)
        float(state.flow.dt)
        return time.perf_counter() - t0, state

    samples = []
    for _ in range(3):
        t1, state = timed_batch(state, STEPS)
        t2, state = timed_batch(state, 2 * STEPS)
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
    }))


def main():
    # The tunneled TPU occasionally drops long dispatch sequences
    # (UNAVAILABLE worker crashes) or hangs; each attempt runs in its own
    # subprocess with a timeout so a wedged/crashed runtime cannot poison
    # the retry at a smaller size. Exactly one JSON line is printed.
    import subprocess

    budget = float(os.environ.get("FS_BENCH_BUDGET_S", "1800"))
    start = time.time()

    # Health gate: the timing below differences two batch sizes and dispatch
    # enqueue is async on this tunnel, so a slow synchronous RTT alone is
    # tolerated ("timeable") — but windows where the DEVICE itself is
    # degraded (~50-60 GB/s effective HBM) would inflate every number ~10x,
    # so those are waited out. tools/tpu_health.py measures rtt / enqueue /
    # effective bandwidth separately and classifies the window.
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
            return line.startswith(("healthy", "timeable"))
        except Exception:
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

    # Config auto-selection: the opt-in variants trade HBM traffic against
    # kernel-launch count, and the tunnel's per-launch overhead swings from
    # ~100 ns (healthy) to 10-50 us (degraded windows, hours at a time) —
    # no single default wins both regimes. A 256^2 canary race picks the
    # fastest config IN THIS WINDOW (launch-bound behavior is kernel-count
    # driven and therefore size-independent, so the small canary transfers):
    #   pallas     fused V-cycle smoothing (+transfers) + momentum + MG
    #              setup RAP (fewer launches+bytes)
    #   refresh    hierarchy built once per step, not per solve (~10k fewer
    #              launches/step at +67% PCG iterations - wins only when
    #              launch-bound)
    # Explicitly-set env vars are respected and skip the canary.
    flags = {}
    _pallas = {"FS_PALLAS_VCYCLE": "1", "FS_PALLAS_MOMENTUM": "1",
               "FS_PALLAS_RAP": "1", "FS_PALLAS_CG": "1"}
    _refresh = {"FS_PRECOND_REFRESH": "step"}
    if (all(os.environ.get(k) is None for k in
            ("FS_PALLAS_VCYCLE", "FS_PALLAS_MOMENTUM", "FS_PRECOND_REFRESH",
             "FS_PALLAS_RAP", "FS_PALLAS_CG"))
            and budget - (time.time() - start) > 1200):
        candidates = [
            ("base", {}),
            ("pallas", _pallas),
            ("refresh-step", _refresh),
            ("pallas+refresh", {**_pallas, **_refresh}),
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
            if best != "base" and valid[best] < 0.95 * valid.get("base", float("inf")):
                flags = dict(candidates[[c[0] for c in candidates].index(best)][1])

    attempts = [(WARMUP, N), (2, N), (2, N // 2), (2, N // 4), (2, N // 8)]
    for k, (warmup, n) in enumerate(attempts):
        remaining = budget - (time.time() - start)
        # leave headroom for at least one fallback attempt
        per_attempt = max(remaining / max(1, (2 - k)), 120.0) if k < 2 else max(remaining, 120.0)
        out, err = run_single(warmup, n, per_attempt, flags)
        if out is not None:
            if flags:
                tag = json.dumps(flags)
                out = out[:-1] + f', "autoselected": {tag}}}'
            print(out)
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
