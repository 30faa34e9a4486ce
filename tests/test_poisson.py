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


def test_boxmg_h_independent_drop():
    # BoxMG (operator-dependent transfers + exact Galerkin 9-point RAP) must
    # converge h-independently on the 1000:1 drop — the property PC-Galerkin
    # MG lacks (mg.v_cycle docstring: 49 -> 67 iters doubling n)
    iters_by_n = {}
    for n in (64, 128):
        g, op = _drop_system(n, n)
        x_true = RNG.normal(size=g.shape_center)
        x_true -= x_true.mean()
        b = linsys.apply_op(op, jnp.asarray(x_true))
        x, rel, iters = cg.solve_pcg(
            op, b, 1e-10, 100, singular=True, precond="boxmg", n_pre=1, n_post=1
        )
        assert rel < 1e-10, (n, float(rel))
        np.testing.assert_allclose(np.asarray(x), x_true, atol=5e-7)
        iters_by_n[n] = int(iters)
    assert iters_by_n[64] <= 20 and iters_by_n[128] <= 20, iters_by_n
    assert iters_by_n[128] <= iters_by_n[64] + 3, iters_by_n


def test_boxmg_pinned_and_checkerboard():
    # pinned (nonsingular) rows and pathological random-checkerboard
    # coefficients through the BoxMG path
    x, x_true, rel, iters = _manufactured_solve(pin="right", precond="boxmg")
    assert rel < 1e-10, (rel, iters)
    np.testing.assert_allclose(x, x_true, atol=5e-7)
    x, x_true, rel, iters = _manufactured_solve(pin=None, precond="boxmg")
    assert rel < 1e-10, (rel, iters)
    np.testing.assert_allclose(x, x_true, atol=5e-7)


def test_boxmg_galerkin_exact_vs_dense():
    # comb-probed coarse operator == dense P^T A P on an odd-sized grid
    import scipy.sparse as sp

    from fluidsolver_tpu.poisson import boxmg

    g, rho_u, rho_v, op = _system(nx=9, ny=7, pin=None, two_phase=True)
    tr = boxmg.collapse_weights(op)
    N, M = op.aC.shape
    Nc, Mc = (N + 1) // 2, (M + 1) // 2
    # dense P from prolong of coarse unit vectors
    P = np.zeros((N * M, Nc * Mc))
    for k in range(Nc * Mc):
        e = np.zeros(Nc * Mc)
        e[k] = 1.0
        P[:, k] = np.asarray(
            boxmg.prolong_box(tr, jnp.asarray(e.reshape(Nc, Mc)), (N, M))
        ).ravel()
    A = oracle.poisson_dense_matrix(
        *oracle.assemble_poisson(g.nx, g.ny, rho_u, rho_v, g.dx, g.dy)
    )
    Ac_dense = P.T @ A @ P
    st9 = boxmg.galerkin_boxmg(op, tr, (N, M))
    # reassemble dense from the 9 coefficient arrays
    got = np.zeros_like(Ac_dense)
    idx = np.arange(Nc * Mc).reshape(Nc, Mc)
    offs = {"aC": (0, 0), "aL": (-1, 0), "aR": (1, 0), "aB": (0, -1),
            "aT": (0, 1), "aSW": (-1, -1), "aSE": (1, -1), "aNW": (-1, 1),
            "aNE": (1, 1)}
    for name, (di, dj) in offs.items():
        arr = np.asarray(getattr(st9, name))
        for i in range(Nc):
            for j in range(Mc):
                ii, jj = i + di, j + dj
                if 0 <= ii < Nc and 0 <= jj < Mc:
                    got[idx[i, j], idx[ii, jj]] += arr[i, j]
    np.testing.assert_allclose(got, Ac_dense, rtol=1e-12, atol=1e-12)
    # restriction is the exact transpose of prolongation
    R = np.zeros((Nc * Mc, N * M))
    for k in range(N * M):
        e = np.zeros(N * M)
        e[k] = 1.0
        R[:, k] = np.asarray(
            boxmg.restrict_box(tr, jnp.asarray(e.reshape(N, M)))
        ).ravel()
    np.testing.assert_allclose(R, P.T, rtol=1e-12, atol=1e-12)


def test_boxmg_closed_form_equals_probing():
    # the production closed-form Galerkin product must equal comb probing
    # exactly, for 5-point and 9-point inputs, odd/even shapes, pinned or not
    from fluidsolver_tpu.poisson import boxmg

    for nx, ny, pin in [(10, 6, None), (9, 7, "right"), (31, 30, None)]:
        g, rho_u, rho_v, op = _system(nx, ny, pin=pin, two_phase=True)
        tr = boxmg.collapse_weights(op)
        probe = boxmg.galerkin_boxmg(op, tr, op.aC.shape)
        closed = boxmg.galerkin_closed(op, tr, op.aC.shape)
        for f in ("aC", "aL", "aR", "aB", "aT", "aSW", "aSE", "aNW", "aNE"):
            np.testing.assert_allclose(
                np.asarray(getattr(closed, f)), np.asarray(getattr(probe, f)),
                atol=1e-12, err_msg=f"{nx}x{ny} pin={pin} 5pt {f}",
            )
        tr2 = boxmg.collapse_weights(probe)
        probe2 = boxmg.galerkin_boxmg(probe, tr2, probe.aC.shape)
        closed2 = boxmg.galerkin_closed(probe, tr2, probe.aC.shape)
        for f in ("aC", "aL", "aR", "aB", "aT", "aSW", "aSE", "aNW", "aNE"):
            np.testing.assert_allclose(
                np.asarray(getattr(closed2, f)), np.asarray(getattr(probe2, f)),
                atol=1e-12, err_msg=f"{nx}x{ny} pin={pin} 9pt {f}",
            )


def test_pcg_warm_start():
    # a perfect guess must converge (near-)immediately; a garbage guess must
    # be discarded by the ||b - A x0|| > ||b|| guard and cost nothing
    g, op = _drop_system(32, 32)
    x_true = RNG.normal(size=g.shape_center)
    x_true -= x_true.mean()
    b = linsys.apply_op(op, jnp.asarray(x_true))
    x_cold, _, it_cold = cg.solve_pcg(op, b, 1e-10, 400, singular=True)
    _, rel, it_warm = cg.solve_pcg(op, b, 1e-10, 400, singular=True, x0=x_cold)
    assert int(it_warm) <= 1, int(it_warm)
    assert float(rel) < 1e-10
    garbage = jnp.asarray(1e6 * RNG.normal(size=g.shape_center))
    x_g, rel_g, it_g = cg.solve_pcg(op, b, 1e-10, 400, singular=True, x0=garbage)
    assert float(rel_g) < 1e-10
    assert int(it_g) <= int(it_cold) + 1, (int(it_g), int(it_cold))
    np.testing.assert_allclose(np.asarray(x_g), x_true, atol=5e-7)


def test_pcg_stagnation_guard_f32():
    # an unattainable tolerance in f32 must terminate at the rounding floor
    # instead of burning max_iter, and report the honest achieved residual
    g, op = _drop_system(64, 64)
    op32 = type(op)(**{
        f: getattr(op, f).astype(jnp.float32) for f in ("aC", "aL", "aR", "aB", "aT")
    })
    x_true = RNG.normal(size=g.shape_center).astype(np.float32)
    x_true -= x_true.mean()
    b = linsys.apply_op(op32, jnp.asarray(x_true))
    x, rel, iters = cg.solve_pcg(op32, b, tol=1e-14, max_iter=500, singular=True)
    assert int(iters) < 150, int(iters)  # stopped at stagnation, not max_iter
    assert float(rel) > 1e-14  # honest (floor above tol)
    assert float(rel) < 1e-5  # but converged to the f32 floor
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)


def test_rhs_mean_subtraction_and_pinning():
    g = make_grid(0.0, 1.0, 8, 0.0, 1.0, 8)
    div = jnp.asarray(RNG.normal(size=g.shape_center))
    rhs = linsys.build_pressure_rhs(div, g.dx, g.dy, 0.1, pin=None)
    assert abs(float(jnp.mean(rhs))) < 1e-14
    rhs = linsys.build_pressure_rhs(div, g.dx, g.dy, 0.1, pin="left")
    assert np.allclose(np.asarray(rhs[0, :]), 0.0)


def test_bf16_precond_direct_inverse_and_containment():
    """FS_PRECOND_DTYPE=bfloat16 regression: the dense coarse inverse must
    build (linalg.inv has no bf16 kernel -> held in f32), and a PCG solve
    with a bf16 preconditioner on an adversarial operator must return a
    FINITE residual (non-finite bf16 cycle outputs are sanitized; a NaN
    relative residual would falsely exit the loop and poison x)."""
    import numpy as np

    from fluidsolver_tpu.core.grid import make_grid
    from fluidsolver_tpu.poisson import boxmg, cg, linsys

    rng = np.random.default_rng(3)
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    op32 = linsys.StencilOp(
        **{k: getattr(op, k).astype(jnp.float32)
           for k in ("aC", "aL", "aR", "aB", "aT")})

    # bf16 hierarchy with a direct coarsest level builds and stays finite
    op16 = linsys.StencilOp(
        **{k: getattr(op, k).astype(jnp.bfloat16)
           for k in ("aC", "aL", "aR", "aB", "aT")})
    levels = boxmg.build_hierarchy(op16)
    assert levels[-1].coarse_inv is None or \
        levels[-1].coarse_inv.dtype == jnp.float32

    b = jnp.asarray(rng.normal(size=op.aC.shape), jnp.float32)
    b = b - jnp.mean(b)
    x, res, iters = cg.solve_pcg(
        op32, b, tol=1e-5, max_iter=60, singular=True,
        precond="boxmg", precond_dtype=jnp.bfloat16)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(jnp.isfinite(res))
