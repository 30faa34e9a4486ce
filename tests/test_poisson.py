"""Pressure-Poisson layer: assembly vs oracle, matvec vs dense, PCG+MG solves."""

import jax.numpy as jnp
import numpy as np

import oracle
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import cg, linsys, mg

RNG = np.random.default_rng(7)


def _system(nx=10, ny=6, pin=None, two_phase=True):
    g = make_grid(0.0, 1.0, nx, 0.0, 0.7, ny)
    if two_phase:
        rho_u = np.where(RNG.random(g.shape_u) > 0.5, 1000.0, 1.0)
        rho_v = np.where(RNG.random(g.shape_v) > 0.5, 1000.0, 1.0)
    else:
        rho_u = np.ones(g.shape_u)
        rho_v = np.ones(g.shape_v)
    op = linsys.assemble_pressure_operator(
        jnp.asarray(rho_u), jnp.asarray(rho_v), g.dx, g.dy, pin
    )
    return g, rho_u, rho_v, op


def test_assembly_matches_oracle():
    for pin in [None, "left", "right", "bottom", "top"]:
        g, rho_u, rho_v, op = _system(pin=pin)
        aC, aL, aR, aB, aT = oracle.assemble_poisson(
            g.nx, g.ny, rho_u, rho_v, g.dx, g.dy, dirichlet=pin
        )
        np.testing.assert_allclose(np.asarray(op.aC), aC, rtol=1e-13)
        np.testing.assert_allclose(np.asarray(op.aL), aL, rtol=1e-13)
        np.testing.assert_allclose(np.asarray(op.aR), aR, rtol=1e-13)
        np.testing.assert_allclose(np.asarray(op.aB), aB, rtol=1e-13)
        np.testing.assert_allclose(np.asarray(op.aT), aT, rtol=1e-13)


def test_apply_op_matches_dense():
    g, rho_u, rho_v, op = _system()
    coeffs = oracle.assemble_poisson(g.nx, g.ny, rho_u, rho_v, g.dx, g.dy)
    A = oracle.poisson_dense_matrix(*coeffs)
    x = RNG.normal(size=g.shape_center)
    got = np.asarray(linsys.apply_op(op, jnp.asarray(x)))
    expected = (A @ x.ravel()).reshape(g.shape_center)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_operator_row_sums_zero_interior():
    # conservation: interior rows of the all-Neumann operator sum to zero
    _, _, _, op = _system(pin=None)
    rowsum = np.asarray(op.aC + op.aL + op.aR + op.aB + op.aT)
    np.testing.assert_allclose(rowsum, 0.0, atol=1e-10)


def test_galerkin_coarse_rowsums_zero():
    _, _, _, op = _system(pin=None)
    c = mg.galerkin_coarsen(op)
    rowsum = np.asarray(c.aC + c.aL + c.aR + c.aB + c.aT)
    np.testing.assert_allclose(rowsum, 0.0, atol=1e-9)


def _drop_system(nx, ny, pin=None, ratio=1000.0):
    """Realistic two-phase coefficients: a liquid drop in gas."""
    g = make_grid(0.0, 1.0, nx, 0.0, 1.0, ny)
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    in_u = (Xu - 0.5) ** 2 + (Yu - 0.5) ** 2 < 0.25**2
    in_v = (Xv - 0.5) ** 2 + (Yv - 0.5) ** 2 < 0.25**2
    rho_u = np.where(in_u, ratio, 1.0)
    rho_v = np.where(in_v, ratio, 1.0)
    op = linsys.assemble_pressure_operator(
        jnp.asarray(rho_u), jnp.asarray(rho_v), g.dx, g.dy, pin
    )
    return g, op


def _manufactured_solve(pin, precond="mg", nx=32, ny=24, coeffs="random", tol=1e-10, max_iter=500):
    if coeffs == "random":
        g, rho_u, rho_v, op = _system(nx, ny, pin=pin, two_phase=True)
    else:
        g, op = _drop_system(nx, ny, pin=pin)
    x_true = RNG.normal(size=g.shape_center)
    singular = pin is None
    if singular:
        x_true -= x_true.mean()
    else:
        # pinned rows are identity with zero rhs -> solution zero there
        if pin == "right":
            x_true[-1, :] = 0.0
    b = linsys.apply_op(op, jnp.asarray(x_true))
    x, rel, iters = cg.solve_pcg(op, b, tol=tol, max_iter=max_iter, singular=singular, precond=precond)
    return np.asarray(x), x_true, float(rel), int(iters)


def test_pcg_mg_singular_random_checkerboard():
    # pathological 1000:1 random-checkerboard coefficients: must still converge
    x, x_true, rel, iters = _manufactured_solve(pin=None, max_iter=400)
    assert rel < 1e-10, f"rel={rel}, iters={iters}"
    np.testing.assert_allclose(x, x_true, atol=5e-7)


def test_pcg_mg_pinned():
    x, x_true, rel, iters = _manufactured_solve(pin="right", max_iter=400)
    assert rel < 1e-10, f"rel={rel}, iters={iters}"
    np.testing.assert_allclose(x, x_true, atol=5e-7)


def test_mg_preconditioner_effective_drop():
    # realistic drop coefficients at 1000:1 — MG-PCG must converge fast and
    # far outpace diagonal PCG
    x, x_true, rel, mg_iters = _manufactured_solve(
        pin=None, precond="mg", nx=64, ny=64, coeffs="drop"
    )
    assert rel < 1e-10
    np.testing.assert_allclose(x, x_true, atol=5e-7)
    _, _, _, jac_iters = _manufactured_solve(
        pin=None, precond="jacobi", nx=64, ny=64, coeffs="drop", max_iter=3000
    )
    assert mg_iters < jac_iters / 3, (mg_iters, jac_iters)
    assert mg_iters <= 40, mg_iters


def test_pcg_mg_bf16_preconditioner():
    # lower-precision V-cycle (production TPU path): must still converge,
    # with a modest iteration penalty at most
    g, op = _drop_system(64, 64)
    x_true = RNG.normal(size=g.shape_center)
    x_true -= x_true.mean()
    b = linsys.apply_op(op, jnp.asarray(x_true))
    x32, _, it32 = cg.solve_pcg(op, b, tol=1e-8, max_iter=200, singular=True)
    x16, rel, it16 = cg.solve_pcg(
        op, b, tol=1e-8, max_iter=200, singular=True, precond_dtype=jnp.bfloat16
    )
    assert rel < 1e-8
    np.testing.assert_allclose(np.asarray(x16), x_true, atol=1e-4)
    assert int(it16) <= int(it32) * 2, (int(it16), int(it32))


def test_vcycle_transfer_variants_converge():
    # bilinear and operator-induced transfers are documented experiment
    # branches (mg.v_cycle docstring) — keep them solving correctly
    g, op = _drop_system(32, 32)
    x_true = RNG.normal(size=g.shape_center)
    x_true -= x_true.mean()
    b = linsys.apply_op(op, jnp.asarray(x_true))
    levels = mg.build_hierarchy(op)
    for transfers in ("pc", "bilinear", "oi"):
        # hand-rolled PCG (the non-pc variants are scaled such that they are
        # valid SPD preconditioners but NOT convergent Richardson iterations)
        def M(r):
            z = mg.v_cycle(levels, r, transfers=transfers)
            return z - jnp.mean(z)

        x = jnp.zeros_like(b)
        r = b
        z = M(r)
        p = z
        rz = jnp.sum(r * z)
        for _ in range(60):
            Ap = linsys.apply_op(op, p)
            alpha = rz / jnp.sum(p * Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        x = x - jnp.mean(x)
        err = float(jnp.max(jnp.abs(x - jnp.asarray(x_true))))
        assert err < 1e-6, (transfers, err)


def test_rhs_mean_subtraction_and_pinning():
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 8)
    div = jnp.asarray(RNG.normal(size=g.shape_center))
    rhs = linsys.build_pressure_rhs(div, g.dx, g.dy, 0.1, pin=None)
    assert abs(float(jnp.mean(rhs))) < 1e-14
    rhs = linsys.build_pressure_rhs(div, g.dx, g.dy, 0.1, pin="left")
    assert np.allclose(np.asarray(rhs[0, :]), 0.0)
