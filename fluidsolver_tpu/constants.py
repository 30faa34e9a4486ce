"""Global numerical constants (reference: src/IR.hpp:16-17)."""

import jax.numpy as jnp

# Mixed-cell cutoffs for the VOF fraction (reference values, f64).
VF_LOW = 1e-8
VF_HIGH = 1.0 - VF_LOW


def vf_cutoffs(dtype):
    """Dtype-aware mixed-cell cutoffs (low, high = 1 - low).

    The reference's 1e-8 (src/IR.hpp:16-17) assumes f64: it sits far below
    rounding noise around 0.0/1.0. In f32 (the TPU production dtype)
    eps = 1.19e-7, so advected full cells land at 1 - O(eps) and a 1e-8
    cutoff classifies them as interface cells — each such cell gets a
    degenerate PLIC fit with O(1/dx) curvature, whose sigma*kappa pressure
    jump shifts the drop's interior pressure by O(1) while velocities stay
    clean (measured on the golden-trajectory study: |dp| ~ 1.8 uniform,
    spurious kappa ~ 130 at vf = 1 - 1e-7 cells, tests/test_golden.py).
    Scale the cutoff to 64*eps(dtype): f64 keeps the reference value
    (64*eps64 = 1.4e-14 < 1e-8), f32 gets ~7.6e-6 — far above rounding,
    far below any resolved interface fraction."""
    low = max(VF_LOW, 64.0 * float(jnp.finfo(dtype).eps))
    return low, 1.0 - low
