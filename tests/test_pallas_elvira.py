"""Dense banded Pallas ELVIRA vs the XLA reference paths (interpret mode on
CPU; the real kernel runs on TPU).

Interpret mode under x64 evaluates with higher-precision intermediates
(bitwise-equal f32 col sums subtracted IN-KERNEL gave -4.6e-10, flipping a
near-tie candidate), so — like the tail kernel tests — these run in f64,
where both paths agree to rounding. Parity is asserted on the ELVIRA
criterion itself (the chosen plane's 3x3 reproduction error), which is
invariant under near-tie candidate flips, plus structural checks (valid
mask, fills, unit normals, center-fraction reproduction). The strict-f32
real-kernel path is validated on TPU (tools/validate_vof_tpu.py)."""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.vof import pallas_elvira as pe
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


def _vf_case(nx, ny):
    g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
    vf = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.45) ** 2 + (y - 0.62) ** 2 <= 0.27 ** 2, g)
    return g, jnp.asarray(vf, jnp.float64)


def _fit_err(vf, rec, dx, dy):
    """ELVIRA objective of rec's plane per interior cell (f64 accumulate)."""
    nx_ = jnp.asarray(rec.nx[1:-1, 1:-1], jnp.float64)
    ny_ = jnp.asarray(rec.ny[1:-1, 1:-1], jnp.float64)
    d_ = jnp.asarray(rec.d[1:-1, 1:-1], jnp.float64)
    err = jnp.zeros_like(d_)
    for di, dj in plic._NEIGHBOR_OFFSETS:
        d_n = d_ - (nx_ * di * dx + ny_ * dj * dy)
        pred = plic.area_fraction(nx_, ny_, d_n, dx, dy)
        vfn = jnp.asarray(plic._shift(vf, di, dj), jnp.float64)
        err = err + (pred - vfn) ** 2
    return np.asarray(err)


def test_pallas_elvira_matches_dense():
    for nx, ny in [(62, 62), (94, 40), (63, 41)]:
        g, vf = _vf_case(nx, ny)
        ref = plic._elvira_dense(vf, g.dx, g.dy)
        got = pe.elvira_pallas(vf, dx=g.dx, dy=g.dy, interpret=True)

        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))
        v = np.asarray(ref.valid)[1:-1, 1:-1]
        assert v.any()

        # optimality parity: both chosen planes fit the 3x3 neighborhood
        # equally well (strict inequality would be a missed candidate)
        e_ref = _fit_err(vf, ref, g.dx, g.dy)[v]
        e_got = _fit_err(vf, got, g.dx, g.dy)[v]
        np.testing.assert_allclose(e_got, e_ref, atol=1e-12, rtol=1e-10)

        # unit normals + exact center-fraction reproduction on valid cells
        gnx = np.asarray(got.nx)[1:-1, 1:-1][v]
        gny = np.asarray(got.ny)[1:-1, 1:-1][v]
        np.testing.assert_allclose(gnx ** 2 + gny ** 2, 1.0, atol=1e-12)
        frac = np.asarray(plic.area_fraction(
            got.nx[1:-1, 1:-1], got.ny[1:-1, 1:-1], got.d[1:-1, 1:-1],
            g.dx, g.dy))[v]
        np.testing.assert_allclose(
            frac, np.asarray(vf)[1:-1, 1:-1][v], atol=1e-12)

        # fill values outside the mixed set match the dense reference
        nv = ~np.asarray(ref.valid)
        for name, fill in (("nx", 0.0), ("ny", 1.0), ("d", 0.0)):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name))[nv], fill, err_msg=name)

        # the vast majority of cells agree bit-for-bit on the winner; only
        # near-ties may flip (guards against a systematically different
        # candidate set)
        same = np.isclose(np.asarray(got.d)[1:-1, 1:-1][v],
                          np.asarray(ref.d)[1:-1, 1:-1][v],
                          rtol=1e-9, atol=1e-12)
        assert same.mean() > 0.99, same.mean()


def test_pallas_curvature_matches_dense():
    """Dense Pallas curvature vs the XLA dense volume-matching fit
    (interpret, f64). The kernel's trig-free rotation (ca = -ny,
    sa = ±sqrt(1-ny²)) equals the acos/cos/sin roundtrip for unit normals
    only to rounding, so comparisons carry a tolerance."""
    from fluidsolver_tpu.vof import curvature as cv
    from fluidsolver_tpu.vof import pallas_curvature as pc

    for nx, ny in [(62, 62), (94, 40)]:
        g, vf = _vf_case(nx, ny)
        rec = plic._elvira_dense(vf, g.dx, g.dy)
        ref = cv._curvature_vm_dense(vf, rec, g)
        got = pc.curvature_vm_pallas(rec.nx, rec.ny, rec.d, rec.valid,
                                     dx=g.dx, dy=g.dy, interpret=True)
        a, b = np.asarray(got), np.asarray(ref)
        assert a.shape == b.shape
        # zero off the mixed set
        v = np.asarray(rec.valid)
        np.testing.assert_array_equal(a[~v], 0.0)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a[v], b[v], rtol=1e-6,
                                   atol=1e-8 * scale)


def test_compact_indices_matches_nonzero():
    """compact_indices (top_k lowering) == jnp.nonzero(size, fill_value)
    semantics, incl. row-major order, fill lanes, and overflow truncation."""
    rng = np.random.default_rng(7)
    for shape, m in [((37, 53), 64), ((37, 53), 2000), ((16, 16), 16)]:
        mask = jnp.asarray(rng.random(shape) < 0.1)
        fill = shape[0] * shape[1]
        ri, rj = jnp.nonzero(mask, size=m, fill_value=fill)
        gi, gj = plic.compact_indices(mask, m, fill)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(gj), np.asarray(rj))
