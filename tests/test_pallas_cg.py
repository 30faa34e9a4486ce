"""Fused PCG-iteration kernels (pallas_cg) vs the XLA loop body.

step_ab / step_c must reproduce the matvec+dots+axpys of one CG iteration;
the only permitted deviation is reduction order (per-band sequential
partials vs jnp.sum's tree), so comparisons are at near-ulp relative
tolerances and the end-to-end test pins convergence + solution, not
bitwise iterates. Interpret mode on CPU; the Mosaic path is exercised on
TPU via FS_PALLAS_CG=1.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import boxmg, cg, linsys
from fluidsolver_tpu.poisson import pallas_cg as pc
from fluidsolver_tpu.poisson.linsys import apply_op


def _setup(nx, ny, seed=5):
    rng = np.random.default_rng(seed)
    g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    shape = op.aC.shape
    x = jnp.asarray(rng.normal(size=shape))
    r = jnp.asarray(rng.normal(size=shape))
    p = jnp.asarray(rng.normal(size=shape))
    z = jnp.asarray(rng.normal(size=shape))
    return op, x, r, p, z


@pytest.mark.parametrize("shape", [(62, 62), (94, 40), (63, 41)])
@pytest.mark.parametrize("prepad", [False, True])
def test_step_ab(shape, prepad):
    op, x, r, p, _ = _setup(*shape)
    op_in = pc.pad_operator(op, x.shape) if prepad else op
    rz = jnp.asarray(1.37)

    Ap = apply_op(op, p)
    pAp_ref = jnp.sum(p * Ap)
    alpha = rz / pAp_ref
    x_ref = x + alpha * p
    r_ref = r - alpha * Ap
    rr_ref = jnp.sum(r_ref * r_ref)

    x2, r2, pAp, rr, sum_r = pc.step_ab(op_in, x, r, p, rz, interpret=True)
    np.testing.assert_allclose(float(sum_r), float(jnp.sum(r_ref)),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(pAp), float(pAp_ref), rtol=1e-12)
    np.testing.assert_allclose(float(rr), float(rr_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r_ref), rtol=1e-10,
                               atol=1e-9)


@pytest.mark.parametrize("singular", [False, True])
def test_step_c(singular):
    op, _, r, p, z_raw = _setup(62, 62, seed=9)
    rz_prev = jnp.asarray(0.73)

    z_ref = z_raw - jnp.mean(z_raw) if singular else z_raw
    rz_new_ref = jnp.sum(r * z_ref)
    beta = rz_new_ref / rz_prev
    p_ref = z_ref + beta * p

    z2, p2, rz_new = pc.step_c(r, z_raw, p, rz_prev, singular,
                               interpret=True)
    np.testing.assert_allclose(float(rz_new), float(rz_new_ref), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z_ref), rtol=1e-12,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref), rtol=1e-9,
                               atol=1e-10)


def test_pcg_fused_iteration_end_to_end(monkeypatch):
    """solve_pcg with the fused iteration converges to the same solution
    in a comparable number of iterations."""
    import functools

    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.09, 1000.0, 1.0))

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)
    rng = np.random.default_rng(21)
    b = jnp.asarray(rng.normal(size=op.aC.shape))
    b = b - jnp.mean(b)

    def solve():
        return cg.solve_pcg(op, b, tol=1e-8, max_iter=100, singular=True,
                            precond="boxmg")

    x_ref, res_ref, it_ref = solve()

    monkeypatch.setenv("FS_PALLAS_CG", "1")
    # gate checks backend; force it and use interpret-mode kernels
    import jax

    monkeypatch.setattr(pc, "step_ab",
                        functools.partial(pc.step_ab, interpret=True))
    monkeypatch.setattr(pc, "step_c",
                        functools.partial(pc.step_c, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    # tests run in f64 (conftest x64); bypass the f64-on-TPU dtype gate so
    # the fused interpret-mode path is actually exercised
    monkeypatch.setattr(pc, "available", lambda *a, **k: True)
    x, res, iters = solve()
    assert float(res) < 1e-8
    assert int(iters) <= int(it_ref) + 3
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-5 * scale)
