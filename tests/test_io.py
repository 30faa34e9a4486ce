"""I/O layer: monitor round-trip, npy dump/restore, VTK/XDMF files,
checkpoint/resume continuity."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.cases import get_case
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.io import checkpoint
from fluidsolver_tpu.io.monitor import Monitor
from fluidsolver_tpu.io.monitor_parse import read_monitor_file
from fluidsolver_tpu.io.npy import load_state_npy, save_state_npy
from fluidsolver_tpu.io.vtk import VTKWriter
from fluidsolver_tpu.io.writer import SaveCadence, make_data_writer
from fluidsolver_tpu.solvers.state import init_flow_state


def test_monitor_roundtrip(tmp_path):
    path = str(tmp_path / "monitor.log")
    vals = {"t": 0.0, "dt": 1e-3, "iters": 7}
    with Monitor(path) as mon:
        mon.add_variable(lambda: vals["t"], "time")
        mon.add_variable(lambda: vals["dt"], "dt")
        mon.add_variable(lambda: vals["iters"], "iter(p)")
        for k in range(3):
            vals["t"] = 0.1 * k
            mon.write()
    data = read_monitor_file(path)
    np.testing.assert_allclose(data["time"], [0.0, 0.1, 0.2])
    np.testing.assert_allclose(data["dt"], 1e-3)
    np.testing.assert_allclose(data["iter(p)"], 7)


def test_npy_dump_and_restore(tmp_path):
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 8)
    st = init_flow_state(g, 1.0, 1e-3)
    st = dataclasses.replace(st, p=st.p.at[3, 3].set(42.0))
    save_state_npy(str(tmp_path), st, g)
    assert (tmp_path / "p.npy").exists()
    assert (tmp_path / "x.npy").exists()
    # npy header must be numpy v1.0-readable
    p = np.load(tmp_path / "p.npy")
    assert p[3, 3] == 42.0

    st2 = load_state_npy(str(tmp_path), init_flow_state(g, 0.0, 0.0))
    assert float(st2.p[3, 3]) == 42.0
    np.testing.assert_allclose(np.asarray(st2.U), np.asarray(st.U))


def test_vtk_writer(tmp_path):
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 6)
    p = jnp.arange(10 * 8, dtype=jnp.float64).reshape(10, 8)
    w = VTKWriter(str(tmp_path), g)
    w.add_scalar("pressure", lambda: p)
    w.add_vector("velocity", lambda: p, lambda: -p)
    path = w.write(0.5)
    raw = open(path, "rb").read()
    assert b"STRUCTURED_GRID" in raw
    assert b"DIMENSIONS 8 6 1" in raw
    assert b"SCALARS pressure double 1" in raw
    assert b"VECTORS velocity double" in raw
    # big-endian payload: first point x == xm[1]
    idx = raw.index(b"POINTS 48 double\n") + len(b"POINTS 48 double\n")
    first = np.frombuffer(raw[idx : idx + 24], dtype=">f8")
    assert np.isclose(first[0], g.xm[1])


def test_xdmf_writer(tmp_path):
    import pytest

    h5py = pytest.importorskip("h5py")
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 6)
    w = make_data_writer(str(tmp_path), g, prefer="xdmf")
    p = jnp.ones(g.shape_center)
    w.add_scalar("pressure", lambda: p)
    w.write(0.0)
    w.write(0.1)
    w.close()
    with h5py.File(os.path.join(str(tmp_path), "data.h5"), "r") as f:
        assert "step_000000/pressure" in f
        assert f["step_000001"].attrs["time"] == 0.1
        assert f["step_000000/pressure"].shape == (6, 8)
    xml = open(os.path.join(str(tmp_path), "data.xdmf")).read()
    assert 'CollectionType="Temporal"' in xml
    assert xml.count("<Grid Name=\"step_") == 2


def test_checkpoint_resume_continuity(tmp_path):
    # run 3 steps, checkpoint, run 2 more; resume from checkpoint and verify
    # bit-identical trajectory — the resume capability the reference lacks
    case = get_case("stationary_drop", n=16)
    state = case.make_state()
    step = case.make_step()
    for _ in range(3):
        state = step(state, 1e9)
    checkpoint.save(str(tmp_path / "ck.npz"), state)
    ref = state
    for _ in range(2):
        ref = step(ref, 1e9)

    restored = checkpoint.restore(str(tmp_path / "ck.npz"), case.make_state())
    out = restored
    for _ in range(2):
        out = step(out, 1e9)
    np.testing.assert_array_equal(np.asarray(out.vf), np.asarray(ref.vf))
    np.testing.assert_array_equal(np.asarray(out.flow.U), np.asarray(ref.flow.U))


def test_save_cadence():
    sc = SaveCadence(dt_write=0.1, t_end=1.0)
    saves = [t for t in np.arange(0.02, 1.02, 0.02) if sc(float(t), 0.02)]
    # roughly every 0.1
    assert 9 <= len(saves) <= 12


def test_vtk_reader_roundtrip(tmp_path):
    """python/vtk_reader.py parses io/vtk.py's output exactly (the VTK
    half of the reference's per-check _vtk/_xdmf verifier pairs)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))
    from vtk_reader import last_vtk_file, read_structured_grid

    g = make_grid(0.0, 2.0, 8, 0.0, 1.0, 6)
    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.normal(size=(10, 8)))
    u = jnp.asarray(rng.normal(size=(10, 8)))
    v = jnp.asarray(rng.normal(size=(10, 8)))
    w = VTKWriter(str(tmp_path), g)
    w.add_scalar("pressure", lambda: p)
    w.add_vector("velocity", lambda: u, lambda: v)
    w.write(0.25)
    w.write(0.75)

    d = read_structured_grid(last_vtk_file(str(tmp_path)))
    assert d["time"] == 0.75
    np.testing.assert_allclose(d["x"], g.xm[1:-1])
    np.testing.assert_allclose(d["y"], g.ym[1:-1])
    np.testing.assert_array_equal(d["scalars"]["pressure"],
                                  np.asarray(p)[1:-1, 1:-1])
    np.testing.assert_array_equal(d["vectors"]["velocity"][..., 0],
                                  np.asarray(u)[1:-1, 1:-1])
    np.testing.assert_array_equal(d["vectors"]["velocity"][..., 1],
                                  np.asarray(v)[1:-1, 1:-1])
