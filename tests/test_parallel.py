"""Multi-device sharding: halo exchange, distributed Jacobi Poisson, and the
GSPMD-sharded full step (8 virtual CPU devices from conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

import oracle
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.parallel import halo

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < N_DEV:
        pytest.skip(f"need {N_DEV} devices")
    return Mesh(np.array(devs[:N_DEV]), ("x",))


def test_halo_exchange(mesh):
    nxl = 4
    ny = 6
    rng = np.random.default_rng(0)
    blocks = rng.normal(size=(N_DEV, nxl + 2, ny))

    fn = shard_map(
        lambda f: halo.halo_exchange_x(f, "x"),
        mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False,
    )
    out = np.asarray(fn(jnp.asarray(blocks.reshape(N_DEV * (nxl + 2), ny))))
    out = out.reshape(N_DEV, nxl + 2, ny)
    for d in range(N_DEV):
        if d > 0:
            np.testing.assert_allclose(out[d, 0], blocks[d - 1, -2])
        else:
            np.testing.assert_allclose(out[d, 0], blocks[0, 0])  # untouched
        if d < N_DEV - 1:
            np.testing.assert_allclose(out[d, -1], blocks[d + 1, 1])
        else:
            np.testing.assert_allclose(out[d, -1], blocks[d, -1])


def test_distributed_jacobi_matches_dense(mesh):
    # small all-Neumann Poisson problem solved by the sharded Jacobi must
    # approach the dense least-squares solution
    nx, ny = 30, 8  # box 32 x 10 -> 8 slabs of 4 rows
    g = make_grid(0.0, 1.0, nx, 0.0, 1.0, ny)
    rho_u = np.ones(g.shape_u)
    rho_v = np.ones(g.shape_v)
    coeffs = oracle.assemble_poisson(nx, ny, rho_u, rho_v, g.dx, g.dy)
    b = np.random.default_rng(1).normal(size=g.shape_center)
    b -= b.mean()

    # dense reference (least-squares because singular)
    A = oracle.poisson_dense_matrix(*coeffs)
    x_ref, *_ = np.linalg.lstsq(A, b.ravel(), rcond=None)
    x_ref = x_ref.reshape(g.shape_center)
    x_ref -= x_ref.mean()

    # build per-device slabs with ghost rows (block row count = 4)
    nxl = (nx + 2) // N_DEV

    def slabify(arr):
        out = np.zeros((N_DEV, nxl + 2, ny + 2))
        padded = np.pad(arr, ((1, 1), (0, 0)))
        for d in range(N_DEV):
            out[d] = padded[d * nxl : d * nxl + nxl + 2, :]
        return out.reshape(N_DEV * (nxl + 2), ny + 2)

    solve = halo.make_distributed_jacobi_poisson(mesh, nxl, ny, n_iter=8000)
    args = [slabify(np.asarray(c)) for c in coeffs] + [slabify(b), slabify(np.zeros_like(b))]
    x, res = solve(*[jnp.asarray(a) for a in args])
    x = np.asarray(x).reshape(N_DEV, nxl + 2, ny + 2)[:, 1:-1, :].reshape(nx + 2, ny + 2)
    x -= x.mean()
    assert float(res) < 1e-6, float(res)
    np.testing.assert_allclose(x, x_ref, atol=1e-4)


def test_dryrun_multichip_entry():
    import __graft_entry__ as entrymod

    entrymod.dryrun_multichip(N_DEV)
