"""End-to-end ``Simulation`` driver: the analog of running a reference
example's ``main()`` (examples/TwoPhaseSolver.cpp:117-404). Exercises the
batched jitted observation layer (one dispatch + one host copy per step),
the monitor table, and the data writer wiring on both a single-phase and a
two-phase case."""

import os

import numpy as np

from fluidsolver_tpu.cases import get_case
from fluidsolver_tpu.driver import Simulation
from fluidsolver_tpu.io.monitor_parse import read_monitor_file


def test_driver_single_phase(tmp_path):
    case = get_case("taylor_green", n=16)
    sim = Simulation(case, output_dir=str(tmp_path), writer="vtk")
    sim.run(t_end=0.03, log_every=0)
    assert sim.n_steps >= 3

    data = read_monitor_file(str(tmp_path / "monitor.log"))
    # one initial row + one per step
    assert len(data["time"]) == sim.n_steps + 1
    assert data["time"][-1] >= 0.03 - 1e-12
    assert np.all(np.isfinite(data["max(U)"]))
    # post-projection divergence stays at scheme level (physics-accuracy
    # invariants live in test_taylor_green.py)
    assert np.all(data["max(div)"][1:] < 0.1)
    # observation caches are invalidated per step: time strictly increases
    assert np.all(np.diff(data["time"]) > 0)
    # writer produced at least the initial frame
    vtks = [f for f in os.listdir(tmp_path) if f.endswith(".vtk")]
    assert vtks


def test_driver_two_phase(tmp_path):
    case = get_case("two_phase_channel", ny=12)
    sim = Simulation(case, output_dir=str(tmp_path), writer="vtk")
    st = sim.run(max_steps=3)
    assert sim.n_steps == 3

    data = read_monitor_file(str(tmp_path / "monitor.log"))
    assert "loss(vof)" in data
    # vf stayed in bounds; strict conservation invariants (1e-12) live in
    # test_vof_advect.py — the channel case has in/outflow
    assert np.all(data["min(vof)"] >= -1e-8)
    assert np.all(data["max(vof)"] <= 1.0 + 1e-8)
    assert abs(data["loss(vof)"][-1]) < 1e-5
    flow = st.flow
    assert bool(np.all(np.isfinite(np.asarray(flow.U))))


def test_driver_check_nan(tmp_path):
    # the NaN tripwire is part of the scalar observer when enabled
    case = get_case("taylor_green", n=16)
    sim = Simulation(case, output_dir=str(tmp_path), writer="vtk",
                     check_nan=True)
    sim.run(max_steps=2)
    assert sim.n_steps == 2


def test_residue_step_snapped_f32():
    """f32 time accumulation leaves t a few ULP short of t_end; the final
    'residue step' must snap to dt == 0 exactly (the no-op path) instead of
    running the physics with 1/dt ~ 1e9 (tests/test_golden.py f32 failure
    mode). Genuine partial steps are untouched, and any remaining time
    above end_tolerance is never snapped (run-loop progress guarantee)."""
    import jax.numpy as jnp
    import numpy as np

    from fluidsolver_tpu.solvers.state import clamp_dt_to_end, end_tolerance

    t_end = 0.0375
    t = jnp.float32(t_end) - jnp.float32(3e-8)  # ~8 ULP short
    dt = clamp_dt_to_end(jnp.float32(2.5e-3), t, t_end)
    assert float(dt) == 0.0

    t2 = jnp.float32(0.036)  # genuine partial final step
    dt2 = clamp_dt_to_end(jnp.float32(2.5e-3), t2, t_end)
    assert np.isclose(float(dt2), t_end - 0.036, rtol=1e-5)

    # consistency: if the run-loop guard does NOT fire, dt stays positive
    tol = end_tolerance(jnp.float32, t_end)
    t3 = jnp.float32(t_end - 2 * tol)
    dt3 = clamp_dt_to_end(jnp.float32(2.5e-3), t3, t_end)
    assert float(dt3) > 0.0

    # f64: tolerance stays at the old 1e-14 absolute guard
    assert end_tolerance(jnp.float64, t_end) == 1e-14
