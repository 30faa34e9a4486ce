"""Distributed BoxMG-PCG (parallel/dist_poisson.py) vs the single-device
production solve (poisson/cg.py, precond="boxmg").

The distributed hierarchy is constructed to be bitwise the single-device
one on real rows (halo-extended setup, decoupled identity padding), so the
preconditioner is the same map and PCG must match the single-device solve
iterate-for-iterate up to dot-product reduction order: iteration count
within +-1 and the same solution to the solve tolerance.

Solve contract matches src/LinearSolver_StructHypre.hpp:119-192 (relative
residual tolerance, iteration count out); the reference itself has no
distributed solver (HYPRE built without MPI) — this is the TPU-side bar
from SURVEY.md S2/S5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fluidsolver_tpu.parallel import dist_poisson
from fluidsolver_tpu.poisson import cg, linsys


def _mesh():
    return Mesh(np.array(jax.devices()), ("x",))


def _jump_system(n, pin, ratio=1000.0, seed=0):
    """Pressure operator from a smooth 1000:1 density blob + a generic rhs."""
    dx = dy = 1.0 / n
    rng = np.random.default_rng(seed)

    def rho_at(X, Y):
        blob = np.exp(-((X - 0.55) ** 2 + (Y - 0.45) ** 2) / 0.03)
        return 1.0 + (ratio - 1.0) * blob

    xu = (np.arange(n + 3) - 1.0) * dx          # u-face x coords
    yc = (np.arange(n + 2) - 0.5) * dy
    xc = (np.arange(n + 2) - 0.5) * dx
    yv = (np.arange(n + 3) - 1.0) * dy
    rho_u = jnp.asarray(rho_at(xu[:, None], yc[None, :]))
    rho_v = jnp.asarray(rho_at(xc[:, None], yv[None, :]))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, dx, dy, pin)
    div = jnp.asarray(rng.normal(size=(n + 2, n + 2)))
    rhs = linsys.build_pressure_rhs(div, dx, dy, dt=1e-2, pin=pin)
    return op, rhs


@pytest.mark.parametrize("n,pin", [(64, "right"), (64, None), (33, "left")])
def test_dist_pcg_matches_single_device(n, pin):
    op, rhs = _jump_system(n, pin)
    singular = pin is None
    tol = 1e-8

    x_s, rel_s, it_s = cg.solve_pcg(
        op, rhs, tol=tol, max_iter=200, singular=singular, precond="boxmg")
    x_d, rel_d, it_d = dist_poisson.solve_pcg_sharded(
        _mesh(), op, rhs, tol=tol, max_iter=200, singular=singular)

    it_s, it_d = int(it_s), int(it_d)
    assert it_s < 200, "single-device solve saturated max_iter; test vacuous"
    assert abs(it_d - it_s) <= 1, (it_s, it_d)
    assert float(rel_d) <= tol

    # true residual of the distributed solution
    r = rhs - linsys.apply_op(op, x_d)
    if singular:
        r = r - jnp.mean(r)
    true_rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert true_rel < 5 * tol, true_rel

    a, b = np.asarray(x_s), np.asarray(x_d)
    if singular:
        a, b = a - a.mean(), b - b.mean()
    scale = max(np.abs(a).max(), 1e-30)
    assert np.abs(a - b).max() / scale < 50 * tol


def test_dist_pcg_warm_start():
    """A converged solution used as warm start must exit in O(1) iterations."""
    op, rhs = _jump_system(48, "right")
    mesh = _mesh()
    x1, _, it1 = dist_poisson.solve_pcg_sharded(
        mesh, op, rhs, tol=1e-8, max_iter=200, singular=False)
    _, rel2, it2 = dist_poisson.solve_pcg_sharded(
        mesh, op, rhs, tol=1e-6, max_iter=200, singular=False, x0=x1)
    assert int(it1) > 3
    assert int(it2) <= 1, int(it2)
    assert float(rel2) <= 1e-6


@pytest.mark.parametrize("pin", ["right", None])
def test_dist_pcg_prebuilt_levels(pin):
    """solve_pcg_sharded(levels=build_hierarchy_sharded(...)) is the SAME
    preconditioner as the in-solve build: identical iteration count and a
    solution equal up to XLA fusion-context rounding (the hierarchy values
    round-trip the shard_map boundary unchanged; only the surrounding
    compilation differs). This is the refresh="step" path of the mesh step
    (solvers/twophase.py do_subiters)."""
    op, rhs = _jump_system(64, pin)
    singular = pin is None
    mesh = _mesh()
    x1, rel1, it1 = dist_poisson.solve_pcg_sharded(
        mesh, op, rhs, tol=1e-8, max_iter=200, singular=singular)
    levels = dist_poisson.build_hierarchy_sharded(mesh, op)
    x2, rel2, it2 = dist_poisson.solve_pcg_sharded(
        mesh, op, rhs, tol=1e-8, max_iter=200, singular=singular,
        levels=levels)
    assert int(it1) == int(it2), (int(it1), int(it2))
    a, b = np.asarray(x1), np.asarray(x2)
    if singular:
        a, b = a - a.mean(), b - b.mean()
    scale = max(np.abs(a).max(), 1e-30)
    assert np.abs(a - b).max() / scale < 1e-8


def test_dist_pcg_f32():
    """f32 path (the TPU production dtype): converges to an f32-realistic
    tolerance with the same hierarchy logic."""
    op, rhs = _jump_system(64, "right")
    import dataclasses
    op32 = dataclasses.replace(
        op, **{f.name: getattr(op, f.name).astype(jnp.float32)
               for f in dataclasses.fields(op)})
    rhs32 = rhs.astype(jnp.float32)
    x, rel, it = dist_poisson.solve_pcg_sharded(
        _mesh(), op32, rhs32, tol=1e-4, max_iter=100, singular=False)
    assert x.dtype == jnp.float32
    assert float(rel) <= 1e-4
    assert int(it) < 100


def test_dist_fused_smoother_matches_sweeps(monkeypatch):
    """VERDICT r4 #4: the fused Pallas smoother wired into
    _dist_v_cycle (per-shard pallas_call via pallas_shard.
    fused_smooth_local) must reproduce the _sweep_local chain — same
    math, one launch + one halo exchange per phase. Forced on in
    interpret mode on the CPU mesh; on TPU meshes the gate
    (_dist_fused_ok under flags.shard_local_pallas) engages it for
    real."""
    import functools

    from fluidsolver_tpu.parallel import pallas_shard

    op, rhs = _jump_system(64, None)
    mesh = _mesh()
    x_b, rel_b, it_b = dist_poisson.solve_pcg_sharded(
        mesh, op, rhs, tol=1e-8, max_iter=100, singular=True,
        n_pre=2, n_post=2)

    monkeypatch.setattr(dist_poisson, "_dist_fused_ok",
                        lambda *a, **k: True)
    monkeypatch.setattr(
        pallas_shard, "fused_smooth_local",
        functools.partial(pallas_shard.fused_smooth_local, interpret=True))
    x_f, rel_f, it_f = dist_poisson.solve_pcg_sharded(
        mesh, op, rhs, tol=1e-8, max_iter=100, singular=True,
        n_pre=2, n_post=2)

    assert abs(int(it_f) - int(it_b)) <= 1, (int(it_f), int(it_b))
    scale = float(jnp.abs(x_b).max())
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_b),
                               atol=1e-10 * scale)
