"""Fused Pallas momentum stage vs the unfused ops/momentum.py sequence
(interpret mode on CPU; the real Mosaic path is exercised on TPU)."""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.ops import momentum as mom
from fluidsolver_tpu.ops.pallas_momentum import fused_momentum


def test_fused_momentum_matches_sequence():
    rng = np.random.default_rng(7)
    for nx, ny in [(62, 47), (33, 94)]:
        g = make_grid(0.0, 1.0, nx, 0.0, 1.3, ny)
        U = jnp.asarray(rng.normal(size=g.shape_u))
        V = jnp.asarray(rng.normal(size=g.shape_v))
        U_old = jnp.asarray(rng.normal(size=g.shape_u))
        V_old = jnp.asarray(rng.normal(size=g.shape_v))
        rho_u_old = jnp.asarray(rng.uniform(1.0, 1000.0, g.shape_u))
        rho_v_old = jnp.asarray(rng.uniform(1.0, 1000.0, g.shape_v))
        rho_u = jnp.asarray(rng.uniform(1.0, 1000.0, g.shape_u))
        rho_v = jnp.asarray(rng.uniform(1.0, 1000.0, g.shape_v))
        visc = jnp.asarray(rng.uniform(1e-3, 1e-1, g.shape_center))
        p = jnp.asarray(rng.normal(size=g.shape_center))
        pj_u = jnp.asarray(rng.normal(size=g.shape_u))
        pj_v = jnp.asarray(rng.normal(size=g.shape_v))
        dt, rho_eps, gx, gy = 1e-3, 1e-3, 0.3, -9.81

        drho_u, drho_v = mom.calc_drhodt(U, V, rho_u_old, rho_v_old, g.dx, g.dy, rho_eps)
        rho_u_ref, rho_v_ref = mom.update_density(
            rho_u_old, rho_v_old, drho_u, drho_v, dt, rho_u, rho_v)
        dmomU, dmomV = mom.calc_dmomdt(
            U, V, rho_u_old, rho_v_old, visc, p, pj_u, pj_v, g.dx, g.dy, rho_eps)
        dmomU = dmomU.at[1:-1, 1:-1].add(rho_u_ref[1:-1, 1:-1] * gx)
        dmomV = dmomV.at[1:-1, 1:-1].add(rho_v_ref[1:-1, 1:-1] * gy)
        U_ref, V_ref = mom.update_velocity(
            U_old, V_old, rho_u_old, rho_v_old, rho_u_ref, rho_v_ref,
            dmomU, dmomV, dt, U, V)

        ru, rv, Un, Vn = fused_momentum(
            U, V, U_old, V_old, rho_u_old, rho_v_old, rho_u, rho_v,
            visc, p, pj_u, pj_v, dt,
            dx=g.dx, dy=g.dy, rho_eps=rho_eps, gx=gx, gy=gy, interpret=True)

        np.testing.assert_allclose(np.asarray(ru), np.asarray(rho_u_ref), atol=1e-11)
        np.testing.assert_allclose(np.asarray(rv), np.asarray(rho_v_ref), atol=1e-11)
        np.testing.assert_allclose(np.asarray(Un), np.asarray(U_ref), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Vn), np.asarray(V_ref), atol=1e-12)
