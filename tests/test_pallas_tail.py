"""Coarse-tail mega-kernel (pallas_tail) vs the XLA V-cycle recursion.

The tail kernel must reproduce boxmg.v_cycle exactly when the coarsest
level runs sweeps (the tail replaces the dense direct inverse with
in-kernel COARSE_SWEEPS, so the reference hierarchy is built with the
direct solve disabled). Interpret mode on CPU; the real Mosaic path is
exercised on TPU via FS_PALLAS_VCYCLE=1.
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.poisson import boxmg, linsys
from fluidsolver_tpu.poisson import pallas_tail as pt


def _op(nx, ny, seed=13):
    rng = np.random.default_rng(seed)
    g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
    rho_u = jnp.asarray(np.where(rng.random(g.shape_u) > 0.5, 1000.0, 1.0))
    rho_v = jnp.asarray(np.where(rng.random(g.shape_v) > 0.5, 1000.0, 1.0))
    op = linsys.assemble_pressure_operator(rho_u, rho_v, g.dx, g.dy, None)
    b = jnp.asarray(rng.normal(size=op.aC.shape))
    return op, b


def _drop_op(nx, ny):
    """Two-phase drop operator (structured 1000:1 jump): the regime BoxMG
    is h-independent on (~10-12 PCG iters). The fully random checkerboard
    of _op is deliberately adversarial for elementwise equivalence tests,
    but NO multigrid converges fast on it — don't use it to assert
    iteration counts."""
    g = make_grid(0.0, 1.0, nx, 0.0, 1.0, ny)

    def rho(shape):
        X, Y = np.meshgrid(np.linspace(0, 1, shape[0]),
                           np.linspace(0, 1, shape[1]), indexing="ij")
        return jnp.asarray(
            np.where((X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.09, 1000.0, 1.0))

    return linsys.assemble_pressure_operator(
        rho(g.shape_u), rho(g.shape_v), g.dx, g.dy, None)


def _sweep_levels(op, deep=False):
    """The production hierarchy with the coarsest-level dense inverse
    stripped, so v_cycle's coarsest branch runs the same COARSE_SWEEPS the
    tail kernel runs — the exact structure the tail implements. With
    ``deep=True`` the direct stop is disabled entirely (more, smaller
    levels — exercises strides up to 2^5)."""
    import dataclasses as dc

    if deep:
        cap = boxmg.DIRECT_CAP
        boxmg.DIRECT_CAP = 0
        try:
            return boxmg.build_hierarchy(op)
        finally:
            boxmg.DIRECT_CAP = cap
    return [dc.replace(l, coarse_inv=None) for l in boxmg.build_hierarchy(op)]


@pytest.mark.parametrize("shape,deep", [((64, 64), True), ((126, 94), False),
                                        ((62, 30), False)])
def test_tail_cycle_matches_v_cycle(shape, deep):
    op, b = _op(*shape)
    levels = _sweep_levels(op, deep=deep)
    assert pt.available(levels, 0, ignore_dtype=True), \
        "tail should qualify at these sizes"
    ref = boxmg.v_cycle(levels, b)
    pack = pt.build_tail_pack(levels, 0)
    got = pt.tail_cycle(pack, b, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12 * scale)


def test_fused_tail_setup_matches_host_build():
    """build_tail_pack_fused (ONE-launch in-kernel setup: dilated
    collapse_weights + Galerkin comb probing) vs the host build chain
    (build_hierarchy levels -> build_tail_pack): the finest transfer
    planes are the same formulas in the same FP order (near bit-exact);
    coarser levels compound the comb-vs-closed Galerkin rounding only.
    The resulting pack must drive tail_cycle to the same output."""
    op = _drop_op(96, 96)
    levels = _sweep_levels(op, deep=True)
    lvl = next(i for i in range(len(levels))
               if pt.available(levels, i, ignore_dtype=True))
    n_levels = len(levels) - lvl
    assert n_levels >= 3, "want a multi-level tail for this test"
    pack_h = pt.build_tail_pack(levels, lvl)
    pack_f = pt.build_tail_pack_fused(levels[lvl].op, n_levels,
                                      interpret=True)
    for d in range(n_levels):
        for k in range(9):
            a = np.asarray(pack_h.coefs[d][k])
            b = np.asarray(pack_f.coefs[d][k])
            scale = max(np.abs(a).max(), 1e-30)
            assert np.abs(a - b).max() / scale < 1e-10, (d, k)
        if d < n_levels - 1:
            for i in range(2):
                a = np.asarray(pack_h.planes[d][i])
                b = np.asarray(pack_f.planes[d][i])
                scale = max(np.abs(a).max(), 1e-30)
                assert np.abs(a - b).max() / scale < 1e-10, (d, i)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.normal(size=levels[lvl].op.aC.shape))
    xh = pt.tail_cycle(pack_h, b, interpret=True)
    xf = pt.tail_cycle(pack_f, b, interpret=True)
    scale = float(jnp.abs(xh).max())
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xh),
                               rtol=1e-10, atol=1e-10 * scale)


def test_fused_tail_setup_5pt_finest():
    """A 5-point tail-finest operator (the tail starting at level 0) gets
    zero corner planes and must round-trip the same way."""
    op, _ = _op(62, 30, seed=5)
    levels = _sweep_levels(op)
    assert pt.available(levels, 0, ignore_dtype=True)
    pack_h = pt.build_tail_pack(levels, 0)
    pack_f = pt.build_tail_pack_fused(levels[0].op, len(levels),
                                      interpret=True)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.normal(size=levels[0].op.aC.shape))
    xh = pt.tail_cycle(pack_h, b, interpret=True)
    xf = pt.tail_cycle(pack_f, b, interpret=True)
    scale = float(jnp.abs(xh).max())
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xh),
                               rtol=1e-10, atol=1e-10 * scale)


def test_v_cycle_tail_wiring(monkeypatch):
    """v_cycle with a tail attached mid-hierarchy == running the fine
    levels via XLA and the tail levels via the kernel."""
    op, b = _op(64, 64, seed=29)
    levels = _sweep_levels(op)
    # attach the tail one level down so both code paths are exercised
    pack = pt.build_tail_pack(levels, 1)
    import dataclasses as dc

    tl = [dc.replace(l) for l in levels]
    tl[1].tail = pack
    monkeypatch.setattr(
        pt, "tail_cycle", functools.partial(pt.tail_cycle, interpret=True))
    got = boxmg.v_cycle(tl, b)
    ref = boxmg.v_cycle(levels, b)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12 * scale)


def test_tail_preconditioner_convergence(monkeypatch):
    """Swapping the direct coarsest solve for in-kernel sweeps must not
    cost PCG convergence (this was the pre-direct-solve configuration)."""
    import dataclasses as dc

    from fluidsolver_tpu.poisson import cg

    op = _drop_op(64, 64)
    rng = np.random.default_rng(33)
    b = jnp.asarray(rng.normal(size=op.aC.shape))
    b = b - jnp.mean(b)

    direct_levels = boxmg.build_hierarchy(op)
    sweep_levels = _sweep_levels(op)
    tl = [dc.replace(l) for l in sweep_levels]
    tl[0].tail = pt.build_tail_pack(sweep_levels, 0)
    monkeypatch.setattr(
        pt, "tail_cycle", functools.partial(pt.tail_cycle, interpret=True))

    def solve(levels):
        _, _, iters = cg.solve_pcg(
            op, b, tol=1e-8, max_iter=100, singular=True,
            precond="boxmg", levels=levels)
        return int(iters)

    it_direct = solve(direct_levels)
    it_tail = solve(tl)
    assert it_tail <= it_direct + 3, (it_tail, it_direct)


def test_full_fused_stack_pcg(monkeypatch):
    """End-to-end wiring of the whole fused Pallas stack (RAP setup +
    fused smoother + in-kernel transfers + coarse-tail kernel) through
    build_hierarchy -> solve_pcg, gates forced on, interpret mode."""
    from fluidsolver_tpu.poisson import cg
    from fluidsolver_tpu.poisson import pallas_rap
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    op = _drop_op(64, 64)
    rng = np.random.default_rng(43)
    b = jnp.asarray(rng.normal(size=op.aC.shape))
    b = b - jnp.mean(b)

    def solve():
        levels = boxmg.build_hierarchy(op)
        x, res, iters = cg.solve_pcg(
            op, b, tol=1e-8, max_iter=100, singular=True,
            precond="boxmg", levels=levels)
        return x, float(res), int(iters)

    x_ref, res_ref, it_ref = solve()

    monkeypatch.setattr(boxmg, "_tr_fine_wanted", lambda: True)
    monkeypatch.setattr(boxmg, "_rap_fused_ok", lambda *a: True)
    monkeypatch.setattr(boxmg, "_fused_ok",
                        lambda level, b: level.tr_fine is not None)
    monkeypatch.setattr(
        pallas_rap, "fused_rap",
        functools.partial(pallas_rap.fused_rap, interpret=True))
    monkeypatch.setattr(
        pv, "fused_smooth",
        functools.partial(pv.fused_smooth, interpret=True))
    monkeypatch.setattr(
        pt, "tail_cycle", functools.partial(pt.tail_cycle, interpret=True))
    # tests run f64 (x64 conftest): bypass the f64-on-TPU gate so the tail
    # actually attaches in this forced-on configuration
    monkeypatch.setattr(
        pt, "available", functools.partial(pt.available, ignore_dtype=True))

    x, res, iters = solve()
    assert res < 1e-8
    assert iters <= it_ref + 3, (iters, it_ref)
    # same linear system, same tolerance: solutions agree to solver tol
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-5 * scale)


def test_tailsetup_truncated_no_shadow_tail(monkeypatch):
    """ADVICE r4 (boxmg.py:658): when the fused-setup build stops at a
    level COARSER than where available() first passes on the truncated
    list (the VMEM gate failed at full depth for the finer level),
    _attach_fused_vcycle must keep THAT tail — re-consulting
    pt.available on finer levels of the truncated list would see a
    shallow remaining depth, pass the gate the finer level failed at
    full depth, and attach a spurious shallow host-built pack that
    shadows the fused one (v_cycle engages the first tail, silently
    stopping the descent)."""
    op = _drop_op(128, 128)

    # gate mirroring the real failure mode: 128/side fails at full depth
    # but passes at depth <= 2 (the truncated-list re-scan); 64 passes
    def fake_available_shape(shape, n_levels, dtype, ignore_dtype=False):
        if n_levels < 2:
            return False
        return max(shape) <= 66 or (n_levels <= 2 and max(shape) <= 130)

    monkeypatch.setattr(pt, "available_shape", fake_available_shape)
    monkeypatch.setattr(
        pt, "build_tail_pack_fused",
        functools.partial(pt.build_tail_pack_fused, interpret=True))
    monkeypatch.setattr(boxmg, "_tailsetup_on", lambda: True)
    monkeypatch.setattr(boxmg, "_tr_fine_wanted", lambda: True)

    levels = boxmg.build_hierarchy(op)
    tails = [i for i, l in enumerate(levels) if l.tail is not None]
    # truncated at the 64-ish level (the first one passing full depth):
    # exactly ONE tail, carried by the truncation level itself
    assert len(levels) == 2, [l.op.aC.shape for l in levels]
    assert tails == [1], tails
    assert max(levels[1].op.aC.shape) <= 66
