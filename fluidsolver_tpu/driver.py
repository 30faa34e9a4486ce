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
from fluidsolver_tpu.solvers.state import end_tolerance


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
        self._setup_observers()
        if save_output:
            os.makedirs(output_dir, exist_ok=True)
            self._setup_writers(writer)

    # -- observation ------------------------------------------------------
    def _flow(self):
        return self.state.flow if self.case.two_phase else self.state

    def _setup_observers(self):
        """Batched, jitted diagnostics.

        On the tunneled axon TPU backend, eager (unjitted) ops are compiled
        remotely per op and are NOT persistently cached: a getter-per-field
        observation layer costs minutes of one-time compiles. Instead ALL
        diagnostics are computed by two jitted state->dict functions (cheap
        scalars for the monitor/loop, full fields for the data writer), each
        dispatched once per step with a single batched device->host copy.
        """
        import jax

        g = self.grid
        two = self.case.two_phase

        @jax.jit
        def scalars(state):
            fl = state.flow if two else state
            div = stencil.divergence(fl.U, fl.V, g.dx, g.dy)
            out = {
                "time": fl.t,
                "dt": fl.dt,
                "max(U)": jnp.max(jnp.abs(fl.U)),
                "max(V)": jnp.max(jnp.abs(fl.V)),
                # interior only: ghost-ring entries of the divergence array
                # are not defined (reference computes it on the interior box,
                # src/Operators.hpp:32-41)
                "max(div)": jnp.max(jnp.abs(div[1:-1, 1:-1])),
                "res(p)": fl.p_res,
                "iter(p)": fl.p_iter,
            }
            if self.check_nan:
                for f in ("U", "V", "p"):
                    out[f"nan({f})"] = jnp.any(jnp.isnan(getattr(fl, f)))
            if two:
                out.update({
                    "min(curv)": jnp.min(state.curv),
                    "max(curv)": jnp.max(state.curv),
                    "min(vof)": jnp.min(state.vf),
                    "max(vof)": jnp.max(state.vf),
                    "int(vof)": jnp.sum(state.vf[1:-1, 1:-1]) * g.dx * g.dy,
                })
            return out

        @jax.jit
        def fields(state):
            fl = state.flow if two else state
            out = {
                "pressure": fl.p,
                "divergence": stencil.divergence(fl.U, fl.V, g.dx, g.dy),
                "velocity_x": stencil.interp_u_center(fl.U),
                "velocity_y": stencil.interp_v_center(fl.V),
            }
            if two:
                out.update({
                    "VOF": state.vf,
                    "curvature": state.curv,
                    "viscosity": fl.visc,
                    "density": stencil.interp_uv_center(fl.rho_u, fl.rho_v),
                })
            return out

        self._scalars_fn = scalars
        self._fields_fn = fields
        self._scalars_cache = None
        self._fields_cache = None

    def _invalidate_obs(self):
        self._scalars_cache = None
        self._fields_cache = None

    def _obs_scalar(self, key):
        import jax

        if self._scalars_cache is None:
            self._scalars_cache = jax.device_get(self._scalars_fn(self.state))
        return self._scalars_cache[key]

    def _obs_field(self, key):
        import jax

        if self._fields_cache is None:
            self._fields_cache = jax.device_get(self._fields_fn(self.state))
        return self._fields_cache[key]

    def _setup_writers(self, writer: str):
        g = self.grid
        self.writer = make_data_writer(self.output_dir, g, prefer=writer)
        for name in ("pressure", "divergence"):
            self.writer.add_scalar(name, lambda k=name: self._obs_field(k))
        self.writer.add_vector(
            "velocity",
            lambda: self._obs_field("velocity_x"),
            lambda: self._obs_field("velocity_y"),
        )
        if self.case.two_phase:
            for name in ("VOF", "curvature", "viscosity", "density"):
                self.writer.add_scalar(name, lambda k=name: self._obs_field(k))

        self.monitor = Monitor(os.path.join(self.output_dir, "monitor.log"))
        mon = self.monitor
        for name in ("time", "dt", "max(U)", "max(V)", "max(div)", "res(p)"):
            mon.add_variable(lambda k=name: float(self._obs_scalar(k)), name)
        mon.add_variable(lambda: int(self._obs_scalar("iter(p)")), "iter(p)")
        if self.case.two_phase:
            for name in ("min(curv)", "max(curv)", "min(vof)", "max(vof)"):
                mon.add_variable(lambda k=name: float(self._obs_scalar(k)), name)
            init_int = float(self._obs_scalar("int(vof)"))
            mon.add_variable(
                lambda: init_int - float(self._obs_scalar("int(vof)")), "loss(vof)"
            )

    # -- time loop ---------------------------------------------------------
    def run(self, t_end: Optional[float] = None, max_steps: int = 10_000_000,
            callback=None, log_every: int = 0):
        t_end = self.case.t_end if t_end is None else t_end
        cadence = SaveCadence(self.case.dt_write, t_end)
        if self.save_output:
            self.writer.write(float(self._obs_scalar("time")))
            self.monitor.write()
        wall0 = time.perf_counter()
        n = 0
        t_tol = end_tolerance(self._flow().t.dtype, t_end)
        while float(self._obs_scalar("time")) < t_end - t_tol and n < max_steps:
            self.state = self.step(self.state, t_end)
            self._invalidate_obs()
            n += 1
            t = float(self._obs_scalar("time"))
            dt = float(self._obs_scalar("dt"))
            if self.warn_nonconverged:
                p_res = float(self._obs_scalar("res(p)"))
                if p_res > self.cfg.pressure_tol:
                    print(f"[{self.case.name}] WARNING: pressure solve did not "
                          f"converge at t={t:.6e}: residual = {p_res:.3e}")
            if self.check_nan:
                for fname in ("U", "V", "p"):
                    if bool(self._obs_scalar(f"nan({fname})")):
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
