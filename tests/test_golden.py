"""Self-golden field regression (SURVEY.md S4 golden-field recommendation).

Committed f64 CPU trajectories (tests/goldens/*.npz, produced by
tools/make_goldens.py) anchor the full solver chain: any silent drift in a
core op — stencils, BCs, VOF reconstruction/advection, curvature, pressure
solve, projection — breaks the f64 comparison in the quick suite. The f32
rerun of the same trajectory pins the documented cross-dtype bound (the TPU
production dtype).

Measured cross-dtype drift (64^2, 15-25 steps, 2026-08-19 study):
- lid_driven_cavity f32 vs f64: max |err|/max|field| <= 2.3e-7 on U/V/p.
- two_phase_drop f32 vs f64: velocities/vf at ~1e-5 rel; BEFORE the
  dtype-aware VF cutoff (constants.vf_cutoffs) full cells at 1 - O(eps32)
  were classified as interface cells, giving spurious O(1/dx) curvature
  and a ~1.8 uniform interior-pressure shift. The cutoff fix removes the
  misclassification; remaining p/curv differences are genuine rounding in
  few-cell interface geometry and are bounded loosely.
"""

import numpy as np
import pytest

from tests.golden_cases import CASES

GOLDEN_DIR = "tests/goldens"


def _load(name):
    return dict(np.load(f"{GOLDEN_DIR}/{name}.npz"))


def _max_rel(out, gold, k):
    scale = max(np.abs(gold[k]).max(), 1e-300)
    return np.abs(out[k].astype(np.float64) - gold[k]).max() / scale


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_f64(name):
    """f64 rerun must reproduce the committed trajectory to ~rounding
    (tolerance leaves room for XLA reassociation across versions only)."""
    gold = _load(name)
    out = {k: np.asarray(v) for k, v in CASES[name](dtype=np.float64)().items()}
    assert float(out["t"]) == pytest.approx(float(gold["t"]), abs=1e-14)
    for k in gold:
        if gold[k].ndim == 0:
            continue
        assert _max_rel(out, gold, k) < 1e-9, (name, k, _max_rel(out, gold, k))


def test_golden_f32_lid_driven_cavity():
    gold = _load("lid_driven_cavity")
    out = {k: np.asarray(v)
           for k, v in CASES["lid_driven_cavity"](dtype=np.float32)().items()}
    for k in ("U", "V", "p"):
        assert _max_rel(out, gold, k) < 1e-5, (k, _max_rel(out, gold, k))


@pytest.mark.slow
def test_golden_f32_two_phase_drop():
    gold = _load("two_phase_drop")
    out = {k: np.asarray(v)
           for k, v in CASES["two_phase_drop"](dtype=np.float32)().items()}
    # velocities and fractions: tight (measured ~4e-3 of max on a near-
    # quiescent field, i.e. |err| ~ 3e-6 absolute)
    assert _max_rel(out, gold, "U") < 3e-2
    assert _max_rel(out, gold, "V") < 3e-3
    assert np.abs(out["vf"].astype(np.float64) - gold["vf"]).max() < 1e-4
    # volume conservation across dtypes
    assert np.sum(out["vf"][1:-1, 1:-1]) == pytest.approx(
        np.sum(gold["vf"][1:-1, 1:-1]), rel=1e-5)
    # pressure: no misclassified-interface contamination — the interior
    # Laplace level must match (median over the drop region), and there
    # must be no spurious O(1/dx) curvature at full cells
    drop = gold["vf"] > 0.99
    p_shift_in = np.median(out["p"][drop]) - np.median(gold["p"][drop])
    assert abs(p_shift_in) < 0.02, p_shift_in  # Laplace jump here is ~0.1
    full = gold["vf"] > 1.0 - 1e-12
    assert np.abs(out["curv"][full]).max() < 1.0, (
        "spurious curvature at full cells — dtype-aware VF cutoff broken?")
