"""Paired same-window A/B: the round-5 measurement protocol.

Round-4 failure mode (VERDICT r4 Weak #1/#2): 10-step batches left drain
jitter at +-4 ms/step while individual optimizations are worth 1-7 ms, and
A and B ran minutes apart in a drifting window — no recorded delta was
adjudicable. This tool fixes both axes at once:

- ONE process builds BOTH variants (env flags are read at trace time, so
  each runner is traced under its own flag set) — no window drift between
  A and B beyond seconds.
- Every timed batch starts from the SAME developed state S0 (the runner is
  functional; the advanced state is discarded), so A and B measure
  byte-identical work on every sample — trajectory divergence (the r4
  p_iter 16-vs-19 confounder) cannot contaminate the comparison.
- 50-step batches (FS_BENCH_STEPS overridable): drain jitter / 50 puts the
  per-step noise floor at ~0.5-1 ms.
- Samples INTERLEAVE A,B,A,B and the statistic is the PAIRED delta
  mean(a_i - b_i) +- std/sqrt(R) — slow window drift cancels in the pairs.

Rows append to artifacts/ab_matrix_r5.jsonl.

Usage:
  python bench_suite/ab_pair.py FLAG [n] [rounds]   # FLAG=1 vs FLAG=0
  python bench_suite/ab_pair.py refresh [n] [rounds]  # step vs solve (cfg)

Measurement-honesty model: /root/reference/bench/dmomdt.cpp:10-13 prints
mean +- stddev; this matches that at step scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "artifacts", "ab_matrix_r5.jsonl")

STEPS = int(os.environ.get("FS_BENCH_STEPS", "50"))
WARMUP = int(os.environ.get("FS_BENCH_WARMUP", "20"))

PALLAS_FLAGS = ("FS_PALLAS_VCYCLE", "FS_PALLAS_MOMENTUM", "FS_PALLAS_RAP",
                "FS_PALLAS_CG", "FS_PALLAS_VOF", "FS_PALLAS_TAIL",
                "FS_PALLAS_TAILSETUP")


def _stamp(msg):
    sys.stderr.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def _make_cfg(n, refresh="step", precond_dtype=None, mg=2, tol_inter=3e-4):
    # baseline tol_inter moved 1e-4 -> 3e-4 on 2026-08-21 (gated + paired;
    # rows recorded before then used a 1e-4 baseline)
    from fluidsolver_tpu.core import bc
    from fluidsolver_tpu.solvers.config import SolverConfig

    # the headline bench configuration (bench.py), refresh parameterized
    return SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 200.0, cfl_max=0.9, dt_max=1e-2, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=0.5, v=0.0), bc.Neumann(),
            bc.Dirichlet(u=0.0, v=0.0), bc.Dirichlet(u=0.0, v=0.0),
        ),
        outflow_correction=True,
        pressure_tol_intermediate=tol_inter,
        pressure_precond_refresh=refresh,
        pressure_precond_dtype=precond_dtype,
        mg_pre=mg, mg_post=mg,
    )


def _build_runner(grid, cfg, env_overrides):
    """Build + trace a scan runner under ``env_overrides`` (trace-time
    flags). The env is restored after the BUILD, but tracing happens at
    the first call — so the caller must invoke warm() (returned) before
    building the next variant."""
    from fluidsolver_tpu.solvers import twophase

    saved = {k: os.environ.get(k) for k in env_overrides}
    os.environ.update(env_overrides)
    runner = twophase.make_scan_runner(grid, cfg, STEPS)

    def finish_env():
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    return runner, finish_env


def _drain(state):
    return float(state.flow.dt)  # true device->host completion barrier


def _timed(runner, s0):
    """Marginal per-step ms from S0: diff a 1-dispatch vs 2-dispatch batch
    (one drain each; fixed drain cost cancels)."""
    t0 = time.perf_counter()
    _drain(runner(s0, 1e9))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _drain(runner(runner(s0, 1e9), 1e9))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / STEPS * 1e3


def run_pair(name, env_a, env_b, n, rounds, cfg_a=None, cfg_b=None):
    import jax.numpy as jnp

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.solvers import twophase
    from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator

    t0 = time.perf_counter()
    float(jnp.zeros(()))  # device init + the sporadic first-D2H stall
    _stamp(f"link ready in {time.perf_counter()-t0:.1f}s")

    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg_a = cfg_a or _make_cfg(n)
    cfg_b = cfg_b or cfg_a
    vf0 = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.3) ** 2 + (y - 0.5) ** 2 <= 0.1**2, g)
    state = twophase.init_two_phase_state(g, cfg_a, vf0, dtype=jnp.float32)

    # variant A: build, trace (first call), develop the flow -> S0
    _stamp(f"building variant A {env_a}")
    run_a, fin_a = _build_runner(g, cfg_a, env_a)
    t0 = time.perf_counter()
    for _ in range(max(1, (WARMUP + STEPS - 1) // STEPS)):
        state = run_a(state, 1e9)
    _drain(state)
    fin_a()
    _stamp(f"A traced + warm in {time.perf_counter()-t0:.1f}s")
    s0 = state  # the shared developed state — every timed batch starts here

    _stamp(f"building variant B {env_b}")
    run_b, fin_b = _build_runner(g, cfg_b, env_b)
    t0 = time.perf_counter()
    _drain(run_b(s0, 1e9))  # trace + first-run B
    fin_b()
    _stamp(f"B traced in {time.perf_counter()-t0:.1f}s")
    _timed(run_a, s0)  # one throwaway pair to touch all buffers
    _timed(run_b, s0)

    a_ms, b_ms = [], []
    for r in range(rounds):
        a_ms.append(_timed(run_a, s0))
        b_ms.append(_timed(run_b, s0))
        _stamp(f"round {r}: A {a_ms[-1]:.2f} ms  B {b_ms[-1]:.2f} ms")

    deltas = [a - b for a, b in zip(a_ms, b_ms)]
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    sd = lambda xs: (sum((x - mean(xs)) ** 2 for x in xs)  # noqa: E731
                     / max(1, len(xs) - 1)) ** 0.5
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    piter_a = int(run_a(s0, 1e9).flow.p_iter)
    piter_b = int(run_b(s0, 1e9).flow.p_iter)
    row = {
        "pair": name, "n": n, "steps_per_dispatch": STEPS, "rounds": rounds,
        "a_env": env_a, "b_env": env_b,
        "a_ms": round(mean(a_ms), 3), "a_sigma": round(sd(a_ms), 3),
        "b_ms": round(mean(b_ms), 3), "b_sigma": round(sd(b_ms), 3),
        "delta_ms": round(mean(deltas), 3),
        # drain-jitter outliers (rare wildly-negative samples) poison the
        # mean; the median paired delta is the robust headline statistic
        "delta_median_ms": round(med(deltas), 3),
        "delta_sem": round(sd(deltas) / max(1, len(deltas)) ** 0.5, 3),
        "a_p_iter": piter_a, "b_p_iter": piter_b,
        "a_samples": [round(x, 3) for x in a_ms],
        "b_samples": [round(x, 3) for x in b_ms],
        "ts": time.time(),
    }
    return row


def probe_health() -> str:
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "tpu_health.py")],
            capture_output=True, text=True, timeout=600)
        return (out.stdout.strip().splitlines()[-1]
                if out.stdout.strip() else "degraded ?")
    except Exception as e:
        return f"degraded ({type(e).__name__})"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "FS_PALLAS_CG"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    health = probe_health()
    _stamp(f"window: {health}")

    if which == "refresh":
        cfg_a, cfg_b = _make_cfg(n, "step"), _make_cfg(n, "solve")
        row = run_pair("refresh step-vs-solve", {}, {}, n, rounds,
                       cfg_a=cfg_a, cfg_b=cfg_b)
    elif which == "nopallas":
        # the whole fused stack on vs off — the launch-model acid test
        row = run_pair("all-pallas vs none", {},
                       {k: "0" for k in PALLAS_FLAGS}, n, rounds)
    elif which == "bf16":
        # half-traffic V-cycle vs f32 — decisive iff the step is
        # bandwidth-bound (p_iter penalty shows in the a/b_p_iter fields)
        row = run_pair("bf16-precond vs f32", {}, {}, n, rounds,
                       cfg_a=_make_cfg(n, precond_dtype="bfloat16"),
                       cfg_b=_make_cfg(n))
    elif which.startswith("mg"):
        # V(k,k) vs V(2,2): under the bandwidth model extra colors in the
        # fused smoother are ~free (temporal blocking) — if p_iter drops,
        # the stronger cycle wins outright
        k = int(which[2])
        row = run_pair(f"V({k},{k}) vs V(2,2)", {}, {}, n, rounds,
                       cfg_a=_make_cfg(n, mg=k), cfg_b=_make_cfg(n))
    elif which == "tolinter34":
        # 3e-4 passes the reference-equal gate (test_two_phase) where
        # 1e-3 fails it by a hair — the loosest physics-clean setting
        row = run_pair("tol_inter 3e-4 vs 1e-4", {}, {}, n, rounds,
                       cfg_a=_make_cfg(n, tol_inter=3e-4),
                       cfg_b=_make_cfg(n, tol_inter=1e-4))
    elif which == "tolinter3":
        # intermediate-subiteration tol 1e-3 vs the production 1e-4 —
        # perf headroom only; a default change needs the golden-physics
        # check that validated 1e-4 (PERF.md r2)
        row = run_pair("tol_inter 1e-3 vs 1e-4", {}, {}, n, rounds,
                       cfg_a=_make_cfg(n, tol_inter=1e-3),
                       cfg_b=_make_cfg(n, tol_inter=1e-4))
    elif which == "round5":
        # the round's net product delta in ONE paired row: r5 defaults
        # (CG+momentum off, tol_inter 3e-4) vs the r4 default set
        row = run_pair("r5 vs r4 defaults", {},
                       {"FS_PALLAS_CG": "1", "FS_PALLAS_MOMENTUM": "1"},
                       n, rounds,
                       cfg_a=_make_cfg(n),
                       cfg_b=_make_cfg(n, tol_inter=1e-4))
    elif which == "steps":
        # protocol self-test: identical variants, pure noise measurement
        row = run_pair("self A==B", {}, {}, n, rounds)
    else:
        assert which in PALLAS_FLAGS, which
        row = run_pair(f"{which} on-vs-off", {which: "1"}, {which: "0"},
                       n, rounds)
    row["window"] = health
    row["window_after"] = probe_health()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
