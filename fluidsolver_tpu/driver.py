"""High-level simulation driver: the analog of each reference example's
``main()`` (e.g. examples/TwoPhaseSolver.cpp:117-404) — output directory,
data writer + monitor channels, time loop with save cadence.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax.numpy as jnp

from fluidsolver_tpu.cases import Case
from fluidsolver_tpu.io.monitor import Monitor
from fluidsolver_tpu.io.writer import SaveCadence, make_data_writer
from fluidsolver_tpu.ops import stencil


class Simulation:
    def __init__(
        self,
        case: Case,
        output_dir: Optional[str] = None,
        writer: str = "xdmf",
        dtype=None,
        save_output: bool = True,
        check_nan: bool = False,
        warn_nonconverged: bool = True,
    ):
        self.case = case
        self.grid = case.grid
        self.cfg = case.cfg
        self.state = case.make_state(dtype=dtype)
        self.step = case.make_step()
        self.save_output = save_output
        # numeric tripwires: the reference NaN-poisons scratch fields and
        # asserts on the Poisson RHS (SURVEY.md §5); here the per-step check
        # is host-side and optional (it forces a device sync)
        self.check_nan = check_nan
        # HYPRE-non-convergence warning analog
        # (src/LinearSolver_StructHypre.hpp:174-189)
        self.warn_nonconverged = warn_nonconverged

        if output_dir is None:
            output_dir = os.path.join("output", case.name)
        self.output_dir = output_dir
        if save_output:
            os.makedirs(output_dir, exist_ok=True)
            self._setup_writers(writer)

    # -- observation ------------------------------------------------------
    def _flow(self):
        return self.state.flow if self.case.two_phase else self.state

    def _setup_writers(self, writer: str):
        g = self.grid
        self.writer = make_data_writer(self.output_dir, g, prefer=writer)
        self.writer.add_scalar("pressure", lambda: self._flow().p)
        self.writer.add_scalar(
            "divergence",
            lambda: stencil.divergence(self._flow().U, self._flow().V, g.dx, g.dy),
        )
        self.writer.add_vector(
            "velocity",
            lambda: stencil.interp_u_center(self._flow().U),
            lambda: stencil.interp_v_center(self._flow().V),
        )
        if self.case.two_phase:
            self.writer.add_scalar("VOF", lambda: self.state.vf)
            self.writer.add_scalar("curvature", lambda: self.state.curv)
            self.writer.add_scalar("viscosity", lambda: self._flow().visc)
            self.writer.add_scalar(
                "density",
                lambda: stencil.interp_uv_center(self._flow().rho_u, self._flow().rho_v),
            )

        self.monitor = Monitor(os.path.join(self.output_dir, "monitor.log"))
        mon = self.monitor
        mon.add_variable(lambda: float(self._flow().t), "time")
        mon.add_variable(lambda: float(self._flow().dt), "dt")
        mon.add_variable(lambda: float(jnp.max(jnp.abs(self._flow().U))), "max(U)")
        mon.add_variable(lambda: float(jnp.max(jnp.abs(self._flow().V))), "max(V)")
        mon.add_variable(
            lambda: float(
                jnp.max(jnp.abs(stencil.divergence(self._flow().U, self._flow().V, g.dx, g.dy)))
            ),
            "max(div)",
        )
        mon.add_variable(lambda: float(self._flow().p_res), "res(p)")
        mon.add_variable(lambda: int(self._flow().p_iter), "iter(p)")
        if self.case.two_phase:
            mon.add_variable(lambda: float(jnp.min(self.state.curv)), "min(curv)")
            mon.add_variable(lambda: float(jnp.max(self.state.curv)), "max(curv)")
            mon.add_variable(lambda: float(jnp.min(self.state.vf)), "min(vof)")
            mon.add_variable(lambda: float(jnp.max(self.state.vf)), "max(vof)")
            init_int = float(jnp.sum(self.state.vf)) * g.dx * g.dy
            mon.add_variable(
                lambda: init_int - float(jnp.sum(self.state.vf)) * g.dx * g.dy, "loss(vof)"
            )

    # -- time loop ---------------------------------------------------------
    def run(self, t_end: Optional[float] = None, max_steps: int = 10_000_000,
            callback=None, log_every: int = 0):
        t_end = self.case.t_end if t_end is None else t_end
        cadence = SaveCadence(self.case.dt_write, t_end)
        if self.save_output:
            self.writer.write(float(self._flow().t))
            self.monitor.write()
        wall0 = time.perf_counter()
        n = 0
        while float(self._flow().t) < t_end - 1e-14 and n < max_steps:
            self.state = self.step(self.state, t_end)
            n += 1
            t = float(self._flow().t)
            dt = float(self._flow().dt)
            if self.warn_nonconverged:
                p_res = float(self._flow().p_res)
                if p_res > self.cfg.pressure_tol:
                    print(f"[{self.case.name}] WARNING: pressure solve did not "
                          f"converge at t={t:.6e}: residual = {p_res:.3e}")
            if self.check_nan:
                import jax.numpy as jnp

                for fname in ("U", "V", "p"):
                    if bool(jnp.any(jnp.isnan(getattr(self._flow(), fname)))):
                        raise FloatingPointError(
                            f"NaN in {fname} at step {n}, t={t:.6e}"
                        )
            if self.save_output:
                self.monitor.write()
                if cadence(t, dt):
                    self.writer.write(t)
            if callback is not None:
                callback(self.state)
            if log_every and n % log_every == 0:
                print(f"[{self.case.name}] step {n}: t={t:.6e} dt={dt:.3e}")
        self.wall_time = time.perf_counter() - wall0
        self.n_steps = n
        return self.state


def main(argv=None):
    import argparse

    from fluidsolver_tpu.cases import get_case, list_cases

    ap = argparse.ArgumentParser(prog="fluidsolver_tpu", description="TPU-native two-phase flow solver")
    ap.add_argument("case", choices=list_cases())
    ap.add_argument("--t-end", type=float, default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--writer", default="xdmf", choices=["xdmf", "vtk"])
    ap.add_argument("--x64", action="store_true", help="enable float64")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--check-nan", action="store_true",
                    help="per-step NaN tripwire (forces a device sync)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the run into DIR")
    ap.add_argument("--param", action="append", default=[], metavar="K=V",
                    help="case parameter override, e.g. --param ny=64")
    args = ap.parse_args(argv)

    if args.x64:
        import fluidsolver_tpu

        fluidsolver_tpu.enable_x64()

    params = {}
    for kv in args.param:
        k, v = kv.split("=", 1)
        try:
            params[k] = int(v)
        except ValueError:
            params[k] = float(v)
    case = get_case(args.case, **params)
    sim = Simulation(case, output_dir=args.output, writer=args.writer,
                     check_nan=args.check_nan)
    if args.profile:
        from fluidsolver_tpu.utils.profiling import device_trace

        with device_trace(args.profile):
            sim.run(t_end=args.t_end, log_every=args.log_every)
    else:
        sim.run(t_end=args.t_end, log_every=args.log_every)
    print(f"[{case.name}] finished: {sim.n_steps} steps in {sim.wall_time:.2f}s "
          f"-> {sim.output_dir}")


if __name__ == "__main__":
    main()
