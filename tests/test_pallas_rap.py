"""Fused Pallas BoxMG setup kernel vs the XLA reference path.

pallas_rap.fused_rap reproduces (collapse_weights, galerkin_closed)
term-for-term; the only permitted deviation is FMA contraction (fused_rap
is jitted, the reference path runs eagerly), so interpret-mode execution
on CPU is compared at a few-hundred-ulp relative tolerance plus an
absolute floor scaled to the O(jump) term magnitude (near-zero coarse
couplings are cancellations of O(1000) terms, so FMA rounding leaves
~1e-12 absolute residue there) — a wrong or missing term would be many
orders larger on either scale. Shapes cover even/odd/anisotropic
grids and both the 5-point finest and 9-point coarse operator forms.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.poisson import boxmg, pallas_rap
from fluidsolver_tpu.poisson.linsys import StencilOp


def _random_op5(n, m, seed=0, jump=1000.0):
    rng = np.random.default_rng(seed)
    # mimic the Poisson operator: negative off-diagonals scaled by a
    # two-phase-like coefficient field, zero-row-sum center
    k = 1.0 + (jump - 1.0) * (rng.random((n, m)) > 0.5)
    aL = -jnp.asarray(rng.random((n, m)) * k + 0.1)
    aR = -jnp.asarray(rng.random((n, m)) * k + 0.1)
    aB = -jnp.asarray(rng.random((n, m)) * k + 0.1)
    aT = -jnp.asarray(rng.random((n, m)) * k + 0.1)
    aC = -(aL + aR + aB + aT)
    return StencilOp(aC=aC, aL=aL, aR=aR, aB=aB, aT=aT)


def _reference(op):
    tr = boxmg.collapse_weights(op)
    coarse = boxmg.galerkin_closed(op, tr, op.aC.shape)
    return tr, coarse


def _compare(op):
    tr_ref, c_ref = _reference(op)
    tr, c, _packed = pallas_rap.fused_rap(op, interpret=True)
    for name in ("pW", "pE", "pS", "pN", "pSW", "pSE", "pNW", "pNE"):
        np.testing.assert_allclose(
            np.asarray(getattr(tr, name)), np.asarray(getattr(tr_ref, name)),
            rtol=1e-13, atol=1e-11, err_msg=f"weight {name}")
    for name in ("aC", "aL", "aR", "aB", "aT", "aSW", "aSE", "aNW", "aNE"):
        np.testing.assert_allclose(
            np.asarray(getattr(c, name)), np.asarray(getattr(c_ref, name)),
            rtol=1e-13, atol=1e-11, err_msg=f"coarse {name}")
    return c


@pytest.mark.parametrize("shape", [(64, 64), (65, 63), (48, 20), (33, 128)])
def test_fused_rap_5pt(shape):
    _compare(_random_op5(*shape))


@pytest.mark.parametrize("shape", [(64, 64), (65, 63)])
def test_fused_rap_9pt(shape):
    op = _random_op5(*shape, seed=3)
    # one reference coarsening produces a genuine 9-point level
    tr = boxmg.collapse_weights(op)
    op9 = boxmg.galerkin_closed(op, tr, op.aC.shape)
    assert isinstance(op9, boxmg.Stencil9)
    _compare(op9)


def test_fused_rap_recursion_matches_hierarchy():
    """Chaining fused levels reproduces build_hierarchy's coarse operators."""
    op = _random_op5(64, 64, seed=7)
    levels = boxmg.build_hierarchy(op)
    cur = op
    for lvl in levels[:-1]:
        tr, nxt, _packed = pallas_rap.fused_rap(cur, interpret=True)
        for name in ("pW", "pN", "pSW", "pNE"):
            np.testing.assert_allclose(
                np.asarray(getattr(tr, name)),
                np.asarray(getattr(lvl.tr, name)), rtol=1e-13, atol=1e-11)
        cur = nxt
    np.testing.assert_allclose(
        np.asarray(cur.aC), np.asarray(levels[-1].op.aC), rtol=1e-13, atol=1e-11)


def test_packed_transfer_from_canvas_matches_pack_transfer():
    """fused_rap's canvas-built (planeU, planeV) == pack_transfer(tr) —
    bit-exact (pure relabeling of the same stored values)."""
    import numpy as np

    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    for shape in [(62, 62), (94, 40), (63, 41)]:
        op = _random_op5(*shape)
        tr, _c, packed = pallas_rap.fused_rap(op, interpret=True)
        ref_u, ref_v = pv.pack_transfer(tr, op.aC.shape)
        np.testing.assert_array_equal(np.asarray(packed[0]),
                                      np.asarray(ref_u))
        np.testing.assert_array_equal(np.asarray(packed[1]),
                                      np.asarray(ref_v))
