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

Delivery design (round-2 postmortem: rc=124, no JSON — a failed round):
- The FIRST successful measurement is held as a provisional result; a
  SIGTERM/SIGALRM handler prints it and exits 0, so an external timeout
  can no longer produce an empty round.
- Attempts run quick-first (tiny warmup at full size, then smaller sizes),
  and only refine (developed-flow warmup) with whatever budget remains.
- Health-waiting is capped at a fixed small slice of the budget, and the
  canary race is gone: the winning flag set is known (all Pallas fusions
  + refresh=step, BENCH_r01/PERF.md) and is simply the default.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

N = int(os.environ.get("FS_BENCH_N", "1024"))
# 50 steps per dispatch (round-5 protocol): the sample noise is drain
# jitter / STEPS — at 10 it was +-4 ms/step, drowning every 1-7 ms kernel
# optimization (VERDICT r4); at 50 the recorded floor is ~0.5-1 ms/step.
STEPS = int(os.environ.get("FS_BENCH_STEPS", "50"))
# develop the flow first so the pressure solve does representative work
# (a quiescent field lets PCG converge in a couple of iterations)
WARMUP = int(os.environ.get("FS_BENCH_WARMUP", "20"))
TARGET_MS = 10.0


def _run(warmup: int, n: int):
    import jax

    t_start = time.perf_counter()

    def stamp(msg):
        sys.stderr.write(f"[{time.perf_counter() - t_start:7.1f}s] {msg}\n")
        sys.stderr.flush()

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
        # loose intermediate subiteration solves (fewer PCG iters, end
        # state equal to rounding — config.py / PERF.md). 3e-4 is the
        # loosest level that passes the reference-equal gate
        # (tests/test_two_phase.py, r5; 1e-3 fails it by a hair) and is
        # worth -1.0 ms/step paired (artifacts/ab_matrix_r5.jsonl)
        pressure_tol_intermediate=float(os.environ.get("FS_TOL_INTER", "3e-4")) or None,
        # A/B knobs (bench_suite/ab_matrix.py)
        pressure_precond_dtype=os.environ.get("FS_PRECOND_DTYPE") or None,
        pressure_precond_refresh=os.environ.get("FS_PRECOND_REFRESH", "step"),
        # sparse-lane budget: unset = auto (sparse), "0" = dense all-cells
        # path (lattice-masked RK4 backtrace, no gathers — see PERF.md)
        vof_max_active=(int(os.environ["FS_VOF_MAX_ACTIVE"])
                        if os.environ.get("FS_VOF_MAX_ACTIVE") else None),
    )
    stamp(f"imports done (n={n}); building state")
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
    stamp(f"state ready (n={n}); compiling + warming {warmup} steps")
    n_warm_batches = max(1, (warmup + STEPS - 1) // STEPS)
    for k in range(n_warm_batches):
        state = runner(state, 1e9)
        if k == 0:
            stamp("first batch dispatched; draining (first D2H can be slow)")
        float(state.flow.dt)
        if k == 0:
            stamp("first batch drained")
    stamp("warmup done; timing")

    def timed_batch(state, n_dispatches):
        t0 = time.perf_counter()
        for _ in range(n_dispatches):
            state = runner(state, 1e9)
        float(state.flow.dt)  # true completion barrier (D2H read)
        return time.perf_counter() - t0, state

    # Latency-immune timing: difference a 1-dispatch and a 2-dispatch batch
    # (one drain each) — fixed drain cost cancels, leaving STEPS marginal
    # steps + one (async, ~us) enqueue. Median over 5 rounds: with 3, the
    # window's drain jitter left a ±4 ms spread on the recorded headline
    # (round-4 A/B runs), below which kernel work was unmeasurable.
    samples = []
    for _ in range(int(os.environ.get("FS_BENCH_SAMPLES", "5"))):
        t1, state = timed_batch(state, 1)
        t2, state = timed_batch(state, 2)
        samples.append((t2 - t1) / STEPS * 1e3)
    positive = sorted(s for s in samples if s > 0)
    if positive:
        ms = positive[len(positive) // 2]
        mean = sum(positive) / len(positive)
        sigma = (sum((s - mean) ** 2 for s in positive)
                 / max(1, len(positive) - 1)) ** 0.5
    else:  # pathological timing noise: fall back to the raw mean
        ms = (t2 / (2 * STEPS)) * 1e3
        sigma = float("nan")

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
        "sigma_ms": round(sigma, 3) if sigma == sigma else None,
        "samples_ms": [round(s, 3) for s in samples],
        "steps_per_dispatch": STEPS,
        "warmup_steps": warmup,
    }), flush=True)


class _Delivery:
    """Hold the best result seen so far; print it exactly once.

    An external timeout (the round-2 failure mode) sends SIGTERM — the
    handler prints the provisional result and exits 0 so the driver always
    parses a number once any measurement has completed.
    """

    def __init__(self):
        self.row = None
        self.printed = False

    def hold(self, row: dict):
        # prefer larger n; at equal n prefer more warmup (honest number)
        if self.row is not None:
            def rank(r):
                return (int(r["metric"].split("_")[3].split("x")[0]),
                        r.get("warmup_steps", 0))
            if rank(row) < rank(self.row):
                return
        self.row = row

    def flush_and_exit(self, code: int = 0):
        if self.row is not None and not self.printed:
            self.printed = True
            print(json.dumps(self.row), flush=True)
        # os._exit: we may be inside a signal handler with a live subprocess
        os._exit(code if self.row is None else 0)


def _worker():
    """Persistent measurement worker: pays JAX init + the sporadic
    minutes-long first-D2H stall ONCE, then serves attempts over stdin
    ("<warmup> <n>" per line) emitting one JSON line each to stdout.

    Rationale (round-3 postmortem): the per-attempt-subprocess design paid
    the first-D2H stall per attempt — measured 24 s .. >9 min PER PROCESS,
    randomly, which blew every per-attempt timeout even with a warm
    compile cache."""
    import jax.numpy as jnp

    import fluidsolver_tpu  # noqa: F401  (persistent compile cache config)

    t0 = time.perf_counter()
    float(jnp.zeros(()))  # device init + the first D2H (the stall)
    sys.stderr.write(f"[worker] link ready in {time.perf_counter()-t0:.1f}s\n")
    sys.stderr.flush()
    print("READY", flush=True)
    for line in sys.stdin:
        parts = line.split()
        if not parts or parts[0] == "quit":
            break
        try:
            _run(int(parts[0]), int(parts[1]))
        except Exception as e:  # report, keep serving
            print(json.dumps(
                {"error": f"{type(e).__name__}: {e}"[:300]}), flush=True)


class _WorkerHandle:
    """Parent-side handle with per-read deadlines and kill/restart."""

    def __init__(self):
        import subprocess

        self._subprocess = subprocess
        self.p = None

    def start(self):
        self.kill()
        self.p = self._subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdin=self._subprocess.PIPE, stdout=self._subprocess.PIPE,
            stderr=None,  # stream worker stamps into our stderr live
            text=True, bufsize=1,
        )

    def kill(self):
        if self.p is not None and self.p.poll() is None:
            self.p.kill()
            try:
                self.p.wait(timeout=10)
            except Exception:
                pass
        self.p = None

    def read_line(self, timeout_s: float):
        """Next stdout line, or None on EOF/death, or "TIMEOUT"."""
        import select

        end = time.time() + timeout_s
        while True:
            left = end - time.time()
            if left <= 0:
                return "TIMEOUT"
            r, _, _ = select.select([self.p.stdout], [], [], min(1.0, left))
            if r:
                line = self.p.stdout.readline()
                return line.strip() if line else None
            if self.p.poll() is not None:
                return None

    def ensure_ready(self, timeout_s: float) -> bool:
        """Live worker that has printed READY (link up), or False."""
        if self.p is None or self.p.poll() is not None:
            if timeout_s < 30:
                return False
            self.start()
            line = self.read_line(timeout_s)
            if line != "READY":
                sys.stderr.write(f"worker failed to come up ({line})\n")
                self.kill()
                return False
        return True

    def request(self, warmup: int, n: int, timeout_s: float):
        """One measurement; returns (json_line | None, err | None). On
        timeout the worker is killed (wedged runtime must not poison the
        next attempt)."""
        if not self.ensure_ready(timeout_s):
            return None, f"(warmup={warmup}, n={n}) no worker"
        try:
            self.p.stdin.write(f"{warmup} {n}\n")
            self.p.stdin.flush()
        except Exception as e:
            self.kill()
            return None, f"(warmup={warmup}, n={n}) worker pipe: {e}"
        line = self.read_line(timeout_s)
        if line == "TIMEOUT":
            self.kill()
            return None, f"(warmup={warmup}, n={n}) timed out ({timeout_s:.0f}s)"
        if not line:
            self.kill()
            return None, f"(warmup={warmup}, n={n}) worker died"
        if line.startswith("{") and '"error"' not in line[:12]:
            return line, None
        return None, f"(warmup={warmup}, n={n}) failed: {line[:300]}"


def main():
    import subprocess

    budget = float(os.environ.get("FS_BENCH_BUDGET_S", "1500"))
    deadline_env = os.environ.get("FS_BENCH_DEADLINE")  # absolute epoch s
    start = time.time()
    deadline = float(deadline_env) if deadline_env else start + budget

    def remaining() -> float:
        return deadline - time.time()

    delivery = _Delivery()
    worker = _WorkerHandle()

    def _on_signal(*_):
        try:
            worker.kill()
        except Exception:
            pass
        delivery.flush_and_exit(1)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_signal)

    last_health = ["unprobed"]

    def healthy() -> bool:
        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "tpu_health.py")],
                capture_output=True, text=True,
                timeout=min(300, max(60, remaining() * 0.2)),
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            sys.stderr.write(f"health probe: {line}\n")
            last_health[0] = line or "no output"
            return line.startswith(("healthy", "timeable"))
        except Exception as e:
            last_health[0] = f"probe failed ({type(e).__name__})"
            return False

    # Bring the worker up FIRST: its READY wait covers device init + the
    # first-D2H stall, which must be paid before any attempt can succeed.
    # The health probe runs concurrently-cheap after (worker already up).
    worker.ensure_ready(min(720.0, max(120.0, remaining() - 600.0)))
    window_ok = healthy()
    health_deadline = start + min(300.0, budget * 0.2)
    while not window_ok and time.time() < health_deadline:
        sys.stderr.write("TPU degraded; waiting 60s for recovery...\n")
        time.sleep(60)
        window_ok = healthy()

    def attempt(warmup, n, timeout):
        if timeout < 60:
            sys.stderr.write(f"bench attempt (warmup={warmup}, n={n}) "
                             f"skipped: out of budget\n")
            return False
        js, err = worker.request(warmup, n, timeout)
        if js is None:
            sys.stderr.write(f"bench attempt {err}\n")
            return False
        row = json.loads(js)
        row["window"] = last_health[0]
        row["window_ok"] = bool(window_ok)
        delivery.hold(row)
        sys.stderr.write(f"held: {row['metric']} = {row['value']} ms\n")
        return True

    # Phase 1 — land ANY number at the headline size fast (tiny warmup),
    # falling back to smaller grids if the full size cannot complete.
    # Within a live worker an attempt costs state build (~60 s at 1024^2)
    # + compile (seconds on a warm persistent cache, minutes cold) + the
    # measured batches; the D2H stall was paid at worker start.
    got_full = attempt(2, N, min(900.0, remaining() - 300.0))
    if not got_full and delivery.row is None:
        for n in (N // 2, N // 4, N // 8):
            if attempt(2, n, min(300.0, remaining() - 60.0)):
                break

    # Phase 2 — refine: developed-flow warmup at the headline size (the
    # honest number). Only replaces the provisional if it completes.
    if got_full and WARMUP > 2 and remaining() > 300:
        attempt(WARMUP, N, remaining() - 30.0)

    worker.kill()
    if delivery.row is None:
        sys.stderr.write("all bench attempts failed\n")
        raise SystemExit(1)
    delivery.flush_and_exit(0)


def _entry():
    if len(sys.argv) == 4 and sys.argv[1] == "--single":
        _run(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) == 2 and sys.argv[1] == "--worker":
        _worker()
    else:
        main()


if __name__ == "__main__":
    _entry()
