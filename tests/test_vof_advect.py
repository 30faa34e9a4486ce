"""VOF geometric advection invariants.

Replicates test/ConstantVelocityVOF.cpp:40-178 and
test/LinearVelocityVOF.cpp: per step the fraction bounds stay in [0,1] to
1e-12, total mass is conserved to 1e-12, the backtracked-cell volume error
is < 1e-12, and the center of mass moves with the prescribed velocity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import stencil
from fluidsolver_tpu.vof import advect as adv
from fluidsolver_tpu.vof import plic
from fluidsolver_tpu.vof.init import liquid_fraction_from_indicator


def _center_of_mass(vf, g):
    mass = float(jnp.sum(vf[1:-1, 1:-1])) * g.dx * g.dy
    X, Y = np.meshgrid(g.xm[1:-1], g.ym[1:-1], indexing="ij")
    wx = float(jnp.sum(jnp.asarray(X) * vf[1:-1, 1:-1])) * g.dx * g.dy
    wy = float(jnp.sum(jnp.asarray(Y) * vf[1:-1, 1:-1])) * g.dx * g.dy
    return wx / mass, wy / mass


def _check_vof(vf, init_int, g, eps=1e-12):
    vmin = float(jnp.min(vf))
    vmax = float(jnp.max(vf))
    integral = float(jnp.sum(vf)) * g.dx * g.dy
    assert abs(vmin) <= eps, f"min(vf) = {vmin:.3e}"
    assert abs(vmax - 1.0) <= eps, f"max(vf) = {vmax:.3e}"
    assert abs(integral - init_int) <= eps, f"mass error = {abs(integral-init_int):.3e}"


def _advect_loop(g, vf, U, V, dt, n_iter, check_com=None):
    import jax

    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)

    @jax.jit
    def one(vf):
        rec = plic.elvira(vf, g.dx, g.dy)
        return adv.advect(vf, rec, U, V, Ui, Vi, g, dt)

    init_int = float(jnp.sum(vf)) * g.dx * g.dy
    com0 = _center_of_mass(vf, g)
    max_vol_err = 0.0
    for it in range(n_iter):
        vf, vol_err = one(vf)
        max_vol_err = max(max_vol_err, float(vol_err))
        assert float(vol_err) < 1e-12, f"iter {it}: volume error {float(vol_err):.3e}"
        _check_vof(vf, init_int, g)
        if check_com is not None:
            ex, ey = check_com(com0, (it + 1) * dt)
            cx, cy = _center_of_mass(vf, g)
            dist = np.hypot(cx - ex, cy - ey)
            assert dist < 5e-5, f"iter {it}: center-of-mass drift {dist:.3e}"
    return vf


N_ITER_QUICK = 10  # reference runs 120 at 128^2; the invariants are per-step


def test_constant_velocity_vof():
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.25) ** 2 + (y - 0.25) ** 2 <= 0.125**2, g
        )
    )
    U0, V0 = 1.0, 0.5
    U = jnp.full(g.shape_u, U0)
    V = jnp.full(g.shape_v, V0)
    dt = 5e-3

    _advect_loop(
        g, vf, U, V, dt, N_ITER_QUICK,
        check_com=lambda c0, t: (c0[0] + t * U0, c0[1] + t * V0),
    )


def test_linear_velocity_vof():
    # solenoidal linear field U = a*(x-0.5), V = -a*(y-0.5): straining flow
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.15**2, g
        )
    )
    a = 0.3
    Xu, _ = np.meshgrid(g.x, g.ym, indexing="ij")
    _, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    U = jnp.asarray(a * (Xu - 0.5))
    V = jnp.asarray(-a * (Yv - 0.5))
    dt = 5e-3
    _advect_loop(g, vf, U, V, dt, 8)


@pytest.mark.slow
def test_constant_velocity_vof_full():
    # the reference's full 120-iteration run
    g = make_grid(0.0, 1.0, 128, 0.0, 1.0, 128)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.25) ** 2 + (y - 0.25) ** 2 <= 0.125**2, g
        )
    )
    U0, V0 = 1.0, 0.5
    U = jnp.full(g.shape_u, U0)
    V = jnp.full(g.shape_v, V0)
    _advect_loop(
        g, vf, U, V, 5e-3, 120,
        check_com=lambda c0, t: (c0[0] + t * U0, c0[1] + t * V0),
    )


def test_sparse_matches_dense():
    """The sparse active-cell path (the default; reference analog:
    ParallelDynamic over mixed cells, src/VOF.hpp:318-332) must reproduce
    the dense all-cells batch to rounding on a deforming shear flow."""
    g = make_grid(0.0, 1.0, 96, 0.0, 1.0, 96)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.35) ** 2 + (y - 0.4) ** 2 <= 0.18**2, g
        )
    )
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    U = jnp.asarray(0.6 + 0.4 * Yu)
    V = jnp.asarray(0.3 - 0.2 * Xv)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    dt = 0.4 * g.dx

    vf_d = vf_s = vf
    for _ in range(6):
        rec = plic.elvira(vf_d, g.dx, g.dy)
        vf_d, err_d = adv.advect(vf_d, rec, U, V, Ui, Vi, g, dt, max_active=0)
        rec = plic.elvira(vf_s, g.dx, g.dy)
        vf_s, err_s = adv.advect(vf_s, rec, U, V, Ui, Vi, g, dt)
    assert float(jnp.max(jnp.abs(vf_d - vf_s))) < 1e-14
    assert abs(float(err_d) - float(err_s)) < 1e-18


def test_sparse_overflow_is_loud():
    """More active cells than lanes must surface as an inf volume error,
    never silent truncation."""
    g = make_grid(0.0, 1.0, 64, 0.0, 1.0, 64)
    vf = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.25**2, g
        )
    )
    U = jnp.full(g.shape_u, 1.0)
    V = jnp.full(g.shape_v, 0.5)
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    rec = plic.elvira(vf, g.dx, g.dy)
    _, err = adv.advect(vf, rec, U, V, Ui, Vi, g, 5e-3, max_active=8)
    assert not np.isfinite(float(err))


def test_eager_numpy_public_api():
    """The sparse chain must work OUTSIDE jit with numpy inputs (public-API
    use; regression: nonzero fill indices raised IndexError eagerly)."""
    from fluidsolver_tpu.vof.curvature import curvature_quad_volume_matching

    g = make_grid(0.0, 1.0, 32, 0.0, 1.0, 32)
    vf = liquid_fraction_from_indicator(
        lambda x, y: (x - 0.4) ** 2 + (y - 0.5) ** 2 <= 0.15**2, g
    )  # numpy array, NOT jnp
    U = np.full(g.shape_u, 1.0)
    V = np.full(g.shape_v, 0.5)
    Ui = stencil.interp_u_center(jnp.asarray(U))
    Vi = stencil.interp_v_center(jnp.asarray(V))

    m0 = float(np.sum(vf[1:-1, 1:-1]))
    rec = plic.elvira(vf, g.dx, g.dy)          # eager sparse ELVIRA
    L = plic.interface_length(rec, g.dx, g.dy)  # eager sparse lanes
    k = curvature_quad_volume_matching(jnp.asarray(vf), rec, g)
    vf1, err = adv.advect(vf, rec, jnp.asarray(U), jnp.asarray(V), Ui, Vi, g, 0.25 * g.dx)
    m1 = float(jnp.sum(vf1[1:-1, 1:-1]))
    assert abs(m1 - m0) / m0 < 1e-11
    assert float(err) < 1e-11
    assert bool(jnp.all(jnp.isfinite(L))) and bool(jnp.all(jnp.isfinite(k)))


def test_advect_variants_ab():
    """The reference's compile-time A/B switches (src/VOF.hpp:216-298) as
    runtime flags: VOF_NO_CORRECTION must RAISE the per-step volume error
    on a NONLINEAR flow (a linear map takes the quad to the exact advected
    cell — the flux-matched caps correct precisely the curved-edge volume a
    4-vertex backtrace cannot represent), and the staggered-velocity
    backtrace must stay conservative on a single-mode field both
    interpolations resolve."""
    import jax

    g = make_grid(0.0, 1.0, 48, 0.0, 1.0, 48)
    vf0 = jnp.asarray(
        liquid_fraction_from_indicator(
            lambda x, y: (x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.2**2, g
        )
    )
    # Taylor-Green vortex: solenoidal and curved everywhere
    Xu, Yu = np.meshgrid(g.x, g.ym, indexing="ij")
    Xv, Yv = np.meshgrid(g.xm, g.y, indexing="ij")
    U = jnp.asarray(np.sin(np.pi * Xu) * np.cos(np.pi * Yu))
    V = jnp.asarray(-np.cos(np.pi * Xv) * np.sin(np.pi * Yv))
    Ui = stencil.interp_u_center(U)
    Vi = stencil.interp_v_center(V)
    dt = 5e-3

    def run(n_iter, **kw):
        @jax.jit
        def one(vf):
            rec = plic.elvira(vf, g.dx, g.dy)
            return adv.advect(vf, rec, U, V, Ui, Vi, g, dt, **kw)

        vf, worst = vf0, 0.0
        for _ in range(n_iter):
            vf, vol_err = one(vf)
            worst = max(worst, float(vol_err))
        return vf, worst

    init_int = float(jnp.sum(vf0)) * g.dx * g.dy

    _, err_base = run(6)
    assert err_base < 1e-12

    # no-correction: plain backtraced quad — volume error is now O(dt^k),
    # clearly nonzero, and mass drifts accordingly
    vf_nc, err_nc = run(6, no_correction=True)
    assert err_nc > 1e3 * max(err_base, 1e-300), (err_nc, err_base)
    assert err_nc < g.dx * g.dy  # still a small fraction of a cell

    # staggered backtrace: for a linear solenoidal field the staggered and
    # centered interpolations represent the same flow -> conservative
    vf_st, err_st = run(6, staggered=True)
    assert err_st < 1e-10, err_st
    int_st = float(jnp.sum(vf_st)) * g.dx * g.dy
    assert abs(int_st - init_int) < 1e-10

    # both variants also run through the sparse path
    for kw in ({"no_correction": True}, {"staggered": True}):
        vf_sp, _ = run(2, max_active=1024, **kw)
        assert bool(jnp.all(jnp.isfinite(vf_sp)))
