"""Boundary-condition ghost-fill semantics (src/BoundaryConditions.hpp)."""

import jax.numpy as jnp
import numpy as np

from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid

G = make_grid(0.0, 1.0, 6, 0.0, 1.0, 4)
RNG = np.random.default_rng(0)


def _uv():
    return jnp.asarray(RNG.normal(size=G.shape_u)), jnp.asarray(RNG.normal(size=G.shape_v))


def test_dirichlet_left_const():
    U, V = _uv()
    bcs = bc.FlowBCs(bc.Dirichlet(u=2.0, v=0.5), bc.Neumann(), bc.Neumann(), bc.Neumann())
    U2, V2 = bc.apply_velocity_bcs(U, V, G, bcs)
    assert np.allclose(np.asarray(U2[0, :]), 2.0)
    assert np.allclose(np.asarray(U2[1, :]), 2.0)
    # V ghost: 2*vbc - interior
    assert np.allclose(np.asarray(V2[0, :]), 2.0 * 0.5 - np.asarray(V2[1, :]))


def test_dirichlet_function_valued():
    U, V = _uv()

    def inflow(y, t):
        return 4.0 * y * (1.0 - y) * t

    bcs = bc.FlowBCs(bc.Dirichlet(u=inflow, v=0.0), bc.Neumann(), bc.Neumann(), bc.Neumann())
    U2, _ = bc.apply_velocity_bcs(U, V, G, bcs, t=2.0)
    expected = 4.0 * G.ym * (1.0 - G.ym) * 2.0
    # corner rows ([0]/[-1]) are overridden by the later bottom/top Neumann
    # pass — same application order as the reference (BoundaryConditions.hpp:215-224)
    assert np.allclose(np.asarray(U2[0, 1:-1]), expected[1:-1])
    assert np.allclose(np.asarray(U2[1, 1:-1]), expected[1:-1])


def test_neumann_clipped_right():
    U, V = _uv()
    U = U.at[G.nx + 1, :].set(jnp.linspace(-1.0, 1.0, G.ny + 2))
    bcs = bc.FlowBCs(bc.Neumann(), bc.Neumann(clipped=True), bc.Neumann(), bc.Neumann())
    U2, _ = bc.apply_velocity_bcs(U, V, G, bcs)
    # corner entries overridden by the later bottom/top pass
    assert np.allclose(
        np.asarray(U2[-1, 1:-1]), np.maximum(np.asarray(U[G.nx + 1, 1:-1]), 0.0)
    )


def test_periodic_all_sides():
    U, V = _uv()
    bcs = bc.FlowBCs(bc.Periodic(), bc.Periodic(), bc.Periodic(), bc.Periodic())
    U2, V2 = bc.apply_velocity_bcs(U, V, G, bcs)
    nx, ny = G.nx, G.ny
    assert np.allclose(np.asarray(U2[0, :]), np.asarray(U2[nx, :]))
    assert np.allclose(np.asarray(U2[nx + 2, :]), np.asarray(U2[2, :]))
    assert np.allclose(np.asarray(V2[:, 0]), np.asarray(V2[:, ny]))
    assert np.allclose(np.asarray(V2[:, ny + 2]), np.asarray(V2[:, 2]))


def test_symmetry_left():
    U, V = _uv()
    bcs = bc.FlowBCs(bc.Symmetry(), bc.Neumann(), bc.Neumann(), bc.Neumann())
    U2, V2 = bc.apply_velocity_bcs(U, V, G, bcs)
    assert np.allclose(np.asarray(U2[1, :]), 0.0)
    assert np.allclose(np.asarray(U2[0, :]), -np.asarray(U2[2, :]))
    assert np.allclose(np.asarray(V2[0, :]), np.asarray(V2[1, :]))


def test_neumann_scalar_corners():
    f = jnp.asarray(RNG.normal(size=G.shape_center))
    f2 = bc.apply_neumann_scalar(f)
    # corner ghost equals the diagonal interior neighbor (x-pass then y-pass)
    assert np.isclose(float(f2[0, 0]), float(f2[1, 1]))
    assert np.isclose(float(f2[-1, -1]), float(f2[-2, -2]))
    assert np.allclose(np.asarray(f2[0, 1:-1]), np.asarray(f2[1, 1:-1]))


def test_dirichlet_scalar():
    f = jnp.asarray(RNG.normal(size=G.shape_center))
    f2 = bc.apply_dirichlet_scalar(f, 7.0)
    assert np.allclose(np.asarray(f2[0, :]), 7.0)
    assert np.allclose(np.asarray(f2[:, -1]), 7.0)
    assert np.allclose(np.asarray(f2[1:-1, 1:-1]), np.asarray(f[1:-1, 1:-1]))
