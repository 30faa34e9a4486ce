"""Padded-carry PCG contract: step_ab / step_c / fused_smooth padded_io.

The padded-carry loop (cg.solve_pcg) keeps every loop-carried full-size
vector in the shared band-padded (N_total, M_pad) layout across the whole
while_loop. These tests pin the contract in interpret mode on CPU:

1. padded_io kernels == their raw-io counterparts (bit-exact up to the
   kernels' own reduction order, which is identical here);
2. the zero-pad invariant: every pad cell of every padded output is
   EXACTLY zero (the banded dots/matvecs rely on it);
3. the end-to-end padded solve == the plain XLA solve.

The real Mosaic path is exercised on TPU (default-on flags)."""

import functools
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import boxmg, cg, linsys
from fluidsolver_tpu.poisson import pallas_cg as pc
from fluidsolver_tpu.poisson import pallas_vcycle as pv
from fluidsolver_tpu.poisson.linsys import apply_op


def _setup(nx, ny, seed=5, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
    rho_u = jnp.asarray(
        np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0), dtype)
    rho_v = jnp.asarray(
        np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0), dtype)
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    shape = op.aC.shape
    vecs = tuple(jnp.asarray(rng.normal(size=shape), dtype) for _ in range(4))
    return op, *vecs


def _pad_region_mask(a_pad, shape):
    N, M = shape
    rows = np.arange(a_pad.shape[0])[:, None]
    cols = np.arange(a_pad.shape[1])[None, :]
    return ~((rows >= 8) & (rows < 8 + N) & (cols < M))


@pytest.mark.parametrize("shape", [(62, 62), (94, 40), (63, 41)])
def test_step_ab_padded_io(shape):
    op, x, r, p, _ = _setup(*shape)
    rz = jnp.asarray(1.37)
    raw = pc.step_ab(pc.pad_operator(op, x.shape), x, r, p, rz,
                     interpret=True)

    xp, rp, pp = (pc.pad_vec(v, x.shape) for v in (x, r, p))
    got = pc.step_ab(pc.pad_operator(op, x.shape), xp, rp, pp, rz,
                     interpret=True, padded_io=True, shape=x.shape)
    # scalar outputs identical (same per-band accumulation order)
    for i in (2, 3, 4):
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(raw[i]))
    for i in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(pc.extract_vec(got[i], x.shape)), np.asarray(raw[i]))
        pad_cells = np.asarray(got[i])[_pad_region_mask(got[i], x.shape)]
        assert np.all(pad_cells == 0.0), "zero-pad invariant broken"


@pytest.mark.parametrize("singular", [False, True])
def test_step_c_padded_io(singular):
    op, _, r, p, z_raw = _setup(62, 62, seed=9)
    rz_prev = jnp.asarray(0.73)
    sum_r = jnp.sum(r)
    raw = pc.step_c(r, z_raw, p, rz_prev, singular, sum_r=sum_r,
                    interpret=True)

    rp, zp, pp = (pc.pad_vec(v, r.shape) for v in (r, z_raw, p))
    got = pc.step_c(rp, zp, pp, rz_prev, singular, sum_r=sum_r,
                    interpret=True, padded_io=True, shape=r.shape)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(raw[2]))
    for i in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(pc.extract_vec(got[i], r.shape)), np.asarray(raw[i]))
        pad_cells = np.asarray(got[i])[_pad_region_mask(got[i], r.shape)]
        assert np.all(pad_cells == 0.0), \
            "zero-pad invariant broken (singular projection must be masked)"


def test_fused_smooth_padded_io():
    # the fine-level M^-1 calls of the padded-carry loop: down (restrict
    # epilogue) and up (correction prologue), padded b/x0/x
    op, b, x0, _, _ = _setup(62, 62, seed=13)
    hier = boxmg.build_hierarchy(op)
    level = hier[0]
    planes = pv.pack_transfer(level.tr, level.op.aC.shape)
    banded = pv.pack_banded(level.op, planes)

    ref_x, ref_bc = pv.fused_smooth(
        level.op, b, colors=(True, False), tr_planes=planes,
        restrict=True, banded=banded, interpret=True)
    bp = pv.band_pad(b, *b.shape)
    got_x, got_bc = pv.fused_smooth(
        level.op, bp, colors=(True, False), tr_planes=planes,
        restrict=True, banded=banded, interpret=True, padded_io=True)
    np.testing.assert_array_equal(np.asarray(got_bc), np.asarray(ref_bc))
    np.testing.assert_array_equal(
        np.asarray(pc.extract_vec(got_x, b.shape)), np.asarray(ref_x))
    pad_cells = np.asarray(got_x)[_pad_region_mask(got_x, b.shape)]
    assert np.all(pad_cells == 0.0)

    Nc, Mc = level.tr.pW.shape
    ec = jnp.asarray(np.random.default_rng(31).normal(size=(Nc, Mc)))
    ref = pv.fused_smooth(level.op, b, x0=x0, colors=(False, True),
                          tr_planes=planes, ec=ec, banded=banded,
                          interpret=True)
    x0p = pv.band_pad(x0, *x0.shape)
    got = pv.fused_smooth(level.op, bp, x0=x0p, colors=(False, True),
                          tr_planes=planes, ec=ec, banded=banded,
                          interpret=True, padded_io=True)
    np.testing.assert_array_equal(
        np.asarray(pc.extract_vec(got, b.shape)), np.asarray(ref))
    pad_cells = np.asarray(got)[_pad_region_mask(got, b.shape)]
    assert np.all(pad_cells == 0.0)


@pytest.mark.parametrize("singular", [False, True])
def test_pcg_padded_carry_end_to_end(monkeypatch, singular):
    """The padded-carry solve == the plain XLA solve (f32, interpret)."""
    import jax

    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.09, 1000.0, 1.0),
            jnp.float32)

    op = linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy,
        None if singular else linsys.PIN_LEFT)
    rng = np.random.default_rng(21)
    b = jnp.asarray(rng.normal(size=op.aC.shape), jnp.float32)
    if singular:
        b = b - jnp.mean(b)

    def solve():
        return cg.solve_pcg(op, b, tol=1e-5, max_iter=100, singular=singular,
                            precond="boxmg")

    x_ref, res_ref, it_ref = solve()

    # force the padded fused path with interpret-mode kernels: TPU-mocked
    # backend, fused RAP/tail off (Mosaic-only), fused smoother + CG on
    monkeypatch.setenv("FS_PALLAS_CG", "1")
    monkeypatch.setenv("FS_PALLAS_VCYCLE", "1")
    monkeypatch.setenv("FS_PALLAS_RAP", "0")
    monkeypatch.setenv("FS_PALLAS_TAIL", "0")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    monkeypatch.setattr(pc, "step_ab",
                        functools.partial(pc.step_ab, interpret=True))
    monkeypatch.setattr(pc, "step_c",
                        functools.partial(pc.step_c, interpret=True))
    monkeypatch.setattr(pc, "step_init",
                        functools.partial(pc.step_init, interpret=True))
    monkeypatch.setattr(pv, "fused_smooth",
                        functools.partial(pv.fused_smooth, interpret=True))

    x, res, iters = solve()
    assert float(res) < 1e-5
    assert int(iters) <= int(it_ref) + 3
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=2e-4 * scale)

    # warm start through the fused init: a perturbed solution must
    # converge in fewer iterations and to the same answer
    x0 = x_ref * jnp.asarray(1.0 + 1e-3, x_ref.dtype)
    xw, res_w, it_w = cg.solve_pcg(op, b, tol=1e-5, max_iter=100,
                                   singular=singular, precond="boxmg",
                                   x0=x0)
    assert float(res_w) < 1e-5
    assert int(it_w) < int(it_ref)
    np.testing.assert_allclose(np.asarray(xw), np.asarray(x_ref),
                               atol=2e-4 * scale)


@pytest.mark.parametrize("singular", [False, True])
@pytest.mark.parametrize("warm", [False, True])
def test_step_init_matches_xla(singular, warm):
    """step_init == the XLA init formulas (f64: identical to rounding;
    scalars to reduction-order tolerance) + the zero-pad invariant."""
    op, b, x0, _, _ = _setup(62, 44, seed=17)
    if singular:
        # near-singular rhs handling is the solver's job; here any rhs works
        b = b - jnp.mean(b)

    def project(v):
        return v - jnp.mean(v) if singular else v

    b1 = project(b)
    if warm:
        x1 = project(x0)
        r_ws = b1 - apply_op(op, x1)
        good = bool(jnp.sum(r_ws * r_ws) < jnp.sum(b1 * b1))
        x_ref = np.asarray(jnp.where(good, x1, 0.0))
        r_ref = np.asarray(jnp.where(good, r_ws, b1))
    else:
        x_ref = np.zeros_like(np.asarray(b))
        r_ref = np.asarray(b1)

    shape = b.shape
    xp, rp, bb, rr0, sum_r0 = pc.step_init(
        pc.pad_operator(op, shape), pc.pad_vec(b, shape),
        pc.pad_vec(x0, shape) if warm else None,
        singular=singular, shape=shape, interpret=True)

    np.testing.assert_allclose(
        np.asarray(pc.extract_vec(xp, shape)), x_ref, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(pc.extract_vec(rp, shape)), r_ref, rtol=1e-13, atol=1e-12)
    np.testing.assert_allclose(float(bb), float(jnp.sum(b1 * b1)), rtol=1e-12)
    np.testing.assert_allclose(float(rr0), float(np.sum(r_ref * r_ref)),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(float(sum_r0), float(np.sum(r_ref)),
                               rtol=1e-10, atol=1e-11)
    for a in (xp, rp):
        pad_cells = np.asarray(a)[_pad_region_mask(a, shape)]
        assert np.all(pad_cells == 0.0), "zero-pad invariant broken"


@pytest.mark.parametrize("singular", [False, True])
def test_step_c_p_zero(singular):
    """step_c(p=None) == step_c with an explicit zero p (the init form)."""
    op, _, r, _, z_raw = _setup(62, 62, seed=23)
    one = jnp.ones(())
    sum_r = jnp.sum(r)
    rp, zp = (pc.pad_vec(v, r.shape) for v in (r, z_raw))
    pz = pc.pad_vec(jnp.zeros_like(r), r.shape)
    ref = pc.step_c(rp, zp, pz, one, singular, sum_r=sum_r,
                    interpret=True, padded_io=True, shape=r.shape)
    got = pc.step_c(rp, zp, None, one, singular, sum_r=sum_r,
                    interpret=True, padded_io=True, shape=r.shape)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
