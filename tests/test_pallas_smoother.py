"""Pallas fused RB smoother vs the XLA reference implementation
(interpret mode on CPU; the real kernel path is exercised on TPU)."""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import linsys, mg
from fluidsolver_tpu.poisson import pallas_smoother as ps


def test_pallas_sweep_matches_xla():
    g = make_grid(0.0, 1.0, 30, 0.0, 1.0, 22)
    rng = np.random.default_rng(5)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    level = mg.MGLevel(op=op, red=mg._checkerboard(op.aC.shape, op.aC.dtype))
    x = jnp.asarray(rng.normal(size=g.shape_center))
    b = jnp.asarray(rng.normal(size=g.shape_center))

    for reverse in [False, True]:
        ref = mg._rb_sweep(level, x, b, reverse=reverse)
        got = ps.rb_sweep_pallas(op, x, b, reverse=reverse, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12)


def test_fused_smooth_matches_sweeps():
    # temporally-blocked multi-half-step kernel == chained XLA color updates
    from fluidsolver_tpu.poisson import boxmg
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    rng = np.random.default_rng(11)
    for nx, ny in [(62, 62), (94, 40)]:
        g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
        rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
        rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
        op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
        level = boxmg.BoxLevel(
            op=op, red=boxmg._checkerboard(op.aC.shape, op.aC.dtype), tr=None
        )
        b = jnp.asarray(rng.normal(size=g.shape_center))
        x0 = jnp.asarray(rng.normal(size=g.shape_center))

        x_ref = jnp.zeros_like(b)
        for _ in range(2):
            x_ref = boxmg._rb_sweep(level, x_ref, b)
        r_ref = b - linsys.apply_op(op, x_ref)
        x, r = pv.fused_smooth(
            op, b, colors=(True, False, True, False), residual=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-12)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-12)

        x_ref = x0
        for _ in range(2):
            x_ref = boxmg._rb_sweep(level, x_ref, b, reverse=True)
        x = pv.fused_smooth(
            op, b, x0=x0, colors=(False, True, False, True), interpret=True
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-12)


def test_sweep_available_gating():
    # CPU backend -> unavailable; VMEM budget respected
    assert not ps.sweep_available((130, 130), jnp.float32, backend="cpu")
    assert ps.sweep_available((514, 514), jnp.float32, backend="tpu")
    assert not ps.sweep_available((4100, 4100), jnp.float32, backend="tpu")


def _boxmg_level(nx, ny, seed=13):
    from fluidsolver_tpu.poisson import boxmg

    rng = np.random.default_rng(seed)
    g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    tr = boxmg.collapse_weights(op)
    level = boxmg.BoxLevel(
        op=op, red=boxmg._checkerboard(op.aC.shape, op.aC.dtype), tr=tr
    )
    b = jnp.asarray(rng.normal(size=g.shape_center))
    x0 = jnp.asarray(rng.normal(size=g.shape_center))
    return boxmg, level, b, x0


def test_fused_restrict_matches_restrict_box():
    # pre-smooth + fused restriction epilogue == sweeps + restrict_box
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    for nx, ny in [(62, 62), (94, 40), (63, 41)]:
        boxmg, level, b, _ = _boxmg_level(nx, ny)
        planes = pv.pack_transfer(level.tr, level.op.aC.shape)

        x_ref = jnp.zeros_like(b)
        for _ in range(1):
            x_ref = boxmg._rb_sweep(level, x_ref, b)
        r_ref = b - linsys.apply_op(level.op, x_ref)
        bc_ref = boxmg.restrict_box(level.tr, r_ref)

        x, bc = pv.fused_smooth(
            level.op, b, colors=(True, False), tr_planes=planes,
            restrict=True, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-12)
        np.testing.assert_allclose(np.asarray(bc), np.asarray(bc_ref),
                                   rtol=1e-11, atol=1e-11)


def test_fused_prolong_matches_prolong_box():
    # prolongation+correction prologue + post-smooth == prolong_box + sweeps
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    for nx, ny in [(62, 62), (94, 40), (63, 41)]:
        boxmg, level, b, x0 = _boxmg_level(nx, ny, seed=17)
        planes = pv.pack_transfer(level.tr, level.op.aC.shape)
        Nc, Mc = level.tr.pW.shape
        rng = np.random.default_rng(19)
        ec = jnp.asarray(rng.normal(size=(Nc, Mc)))

        x_ref = x0 + boxmg.prolong_box(level.tr, ec, b.shape)
        for _ in range(1):
            x_ref = boxmg._rb_sweep(level, x_ref, b, reverse=True)

        x = pv.fused_smooth(
            level.op, b, x0=x0, colors=(False, True), tr_planes=planes,
            ec=ec, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=1e-11, atol=1e-11)


def test_v_cycle_fused_transfers_wiring(monkeypatch):
    # the full v_cycle with tr_fine levels == the plain XLA v_cycle
    import functools

    from fluidsolver_tpu.poisson import boxmg
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    _, level, b, _ = _boxmg_level(64, 64, seed=23)
    levels = boxmg.build_hierarchy(level.op)
    ref = boxmg.v_cycle(levels, b)

    fused_levels = [
        boxmg.BoxLevel(
            op=l.op, red=l.red, tr=l.tr, coarse_inv=l.coarse_inv,
            tr_fine=(pv.pack_transfer(l.tr, l.op.aC.shape)
                     if l.tr is not None else None),
        )
        for l in levels
    ]
    monkeypatch.setattr(boxmg, "_fused_ok",
                        lambda level, b: level.tr_fine is not None)
    monkeypatch.setattr(pv, "fused_smooth",
                        functools.partial(pv.fused_smooth, interpret=True))
    got = boxmg.v_cycle(fused_levels, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)

    # pre-padded (pack_banded) operands: bit-identical to the per-call pads
    for l in fused_levels:
        if l.tr_fine is not None:
            l.banded = pv.pack_banded(l.op, l.tr_fine)
    got_banded = boxmg.v_cycle(fused_levels, b)
    np.testing.assert_array_equal(np.asarray(got_banded), np.asarray(got))


def test_fused_smooth_bf16_storage_f32_compute():
    # bf16 hierarchy support (FS_PRECOND_DTYPE=bfloat16 under the fused
    # kernels): operands stored in bf16 (half the HBM traffic), ALL
    # in-kernel arithmetic in f32. Oracle: "upcast operands to f32, run the
    # XLA sweeps, downcast the outputs" — matched to one bf16 ulp (the
    # oracle's arithmetic order differs at the last f32 bit, which can flip
    # a downcast rounding tie).
    import dataclasses as dc

    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    boxmg, level, b, x0 = _boxmg_level(62, 62, seed=37)
    to16 = lambda a: a.astype(jnp.bfloat16)
    op16 = dc.replace(level.op, **{
        f.name: to16(getattr(level.op, f.name))
        for f in dc.fields(level.op)})
    op32 = dc.replace(op16, **{
        f.name: getattr(op16, f.name).astype(jnp.float32)
        for f in dc.fields(op16)})
    lvl32 = boxmg.BoxLevel(
        op=op32, red=boxmg._checkerboard(op32.aC.shape, jnp.float32),
        tr=None)
    b16, x016 = to16(b), to16(x0)

    assert pv.available(b16.shape, b16.dtype)

    x_ref = x016.astype(jnp.float32)
    for _ in range(2):
        x_ref = boxmg._rb_sweep(lvl32, x_ref, b16.astype(jnp.float32))
    r_ref = b16.astype(jnp.float32) - linsys.apply_op(op32, x_ref)
    x, r = pv.fused_smooth(
        op16, b16, x0=x016, colors=(True, False, True, False),
        residual=True, interpret=True)
    assert x.dtype == jnp.bfloat16 and r.dtype == jnp.bfloat16
    # oracle arithmetic order may differ from the kernel's at the last f32
    # bit; one bf16 ulp (2^-8) of slack absorbs downcast rounding ties
    np.testing.assert_allclose(np.asarray(x, np.float32),
                               np.asarray(to16(x_ref), np.float32),
                               rtol=2**-8, atol=2**-8)
    np.testing.assert_allclose(np.asarray(r, np.float32),
                               np.asarray(to16(r_ref), np.float32),
                               rtol=2**-8, atol=2**-8)

    # transfer-fused variants in bf16: restrict epilogue + correction
    # prologue against the f32-compute oracle
    tr16 = dc.replace(level.tr, **{
        f.name: to16(getattr(level.tr, f.name))
        for f in dc.fields(level.tr)})
    tr32 = dc.replace(tr16, **{
        f.name: getattr(tr16, f.name).astype(jnp.float32)
        for f in dc.fields(tr16)})
    planes16 = pv.pack_transfer(tr16, op16.aC.shape)
    banded16 = pv.pack_banded(op16, planes16)

    x_ref = jnp.zeros_like(b, jnp.float32)
    x_ref = boxmg._rb_sweep(lvl32, x_ref, b16.astype(jnp.float32))
    r_ref = b16.astype(jnp.float32) - linsys.apply_op(op32, x_ref)
    bc_ref = boxmg.restrict_box(tr32, r_ref)
    x, bc = pv.fused_smooth(
        op16, b16, colors=(True, False), tr_planes=planes16,
        restrict=True, banded=banded16, interpret=True)
    np.testing.assert_allclose(np.asarray(x, np.float32),
                               np.asarray(to16(x_ref), np.float32),
                               rtol=2**-8, atol=2**-8)
    np.testing.assert_allclose(np.asarray(bc, np.float32),
                               np.asarray(to16(bc_ref), np.float32),
                               rtol=2**-8, atol=2**-7)

    Nc, Mc = level.tr.pW.shape
    ec16 = to16(jnp.asarray(np.random.default_rng(41).normal(size=(Nc, Mc))))
    x_ref = x016.astype(jnp.float32) + boxmg.prolong_box(
        tr32, ec16.astype(jnp.float32), b.shape)
    x_ref = boxmg._rb_sweep(lvl32, x_ref, b16.astype(jnp.float32),
                            reverse=True)
    x = pv.fused_smooth(
        op16, b16, x0=x016, colors=(False, True), tr_planes=planes16,
        ec=ec16, banded=banded16, interpret=True)
    np.testing.assert_allclose(np.asarray(x, np.float32),
                               np.asarray(to16(x_ref), np.float32),
                               rtol=2**-8, atol=2**-8)


def test_fused_smooth_banded_parity():
    # banded= pre-padded operands produce bit-identical results in every
    # call variant (restrict epilogue, correction prologue, plain residual)
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    boxmg, level, b, x0 = _boxmg_level(63, 41, seed=29)
    planes = pv.pack_transfer(level.tr, level.op.aC.shape)
    banded = pv.pack_banded(level.op, planes)

    ref_x, ref_bc = pv.fused_smooth(
        level.op, b, colors=(True, False), tr_planes=planes,
        restrict=True, interpret=True)
    got_x, got_bc = pv.fused_smooth(
        level.op, b, colors=(True, False), tr_planes=planes,
        restrict=True, banded=banded, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref_x))
    np.testing.assert_array_equal(np.asarray(got_bc), np.asarray(ref_bc))

    Nc, Mc = level.tr.pW.shape
    ec = jnp.asarray(np.random.default_rng(31).normal(size=(Nc, Mc)))
    ref = pv.fused_smooth(level.op, b, x0=x0, colors=(False, True),
                          tr_planes=planes, ec=ec, interpret=True)
    got = pv.fused_smooth(level.op, b, x0=x0, colors=(False, True),
                          tr_planes=planes, ec=ec, banded=banded,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    ref_x, ref_r = pv.fused_smooth(level.op, b, colors=(True, False),
                                   residual=True, interpret=True)
    got_x, got_r = pv.fused_smooth(level.op, b, colors=(True, False),
                                   residual=True, banded=banded,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref_x))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))
