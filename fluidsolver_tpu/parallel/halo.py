"""Explicit halo exchange over a device mesh (shard_map + ppermute).

The reference has no inter-process communication at all (SURVEY.md §2:
HYPRE built without MPI); multi-chip scaling here is spatial domain
decomposition over a 1D device mesh along grid-x. Two usage levels exist:

  1. GSPMD (default): the solvers are written as global-view array programs
     and `__graft_entry__.dryrun_multichip` shards them with
     ``with_sharding_constraint`` — XLA inserts the halo collectives.
  2. This module: explicit ``shard_map`` building blocks for when the
     scheduler must control communication (overlap, fewer collectives) —
     the ghost ring of each local slab is refreshed point-to-point with
     ``lax.ppermute`` over ICI neighbors.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from jax import lax


def halo_exchange_x(f: jnp.ndarray, axis_name: str, periodic: bool = False) -> jnp.ndarray:
    """Refresh the 1-cell x-ghost layers of a local slab from the mesh
    neighbors. ``f``: local array (nx_local+2, ...); the first/last rows are
    ghosts. Non-periodic outer-boundary ghosts keep their current values
    (the physical BCs own them)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # send my last interior row to the right neighbor's left ghost
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    from_left = lax.ppermute(f[-2], axis_name, right_perm)
    # send my first interior row to the left neighbor's right ghost
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_right = lax.ppermute(f[1], axis_name, left_perm)

    if periodic:
        f = f.at[0].set(from_left).at[-1].set(from_right)
    else:
        f = f.at[0].set(jnp.where(idx > 0, from_left, f[0]))
        f = f.at[-1].set(jnp.where(idx < n - 1, from_right, f[-1]))
    return f


def psum_scalar(x, axis_name: str):
    return lax.psum(x, axis_name)


def pmax_scalar(x, axis_name: str):
    return lax.pmax(x, axis_name)


def make_distributed_jacobi_poisson(mesh, nx_local: int, ny: int, n_iter: int = 200):
    """Distributed weighted-Jacobi pressure solve over an x-sharded slab
    decomposition — the communication skeleton (halo exchange per sweep +
    psum reductions) that a full distributed MG-PCG reuses.

    Local arrays: (nx_local+2, ny+2) with ghost rings; the 5-point operator
    coefficients are sharded the same way.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("x"), P("x"), P("x"), P("x"), P("x"), P("x"), P("x")),
        out_specs=(P("x"), P()),
        check_vma=False,
    )
    def solve(aC, aL, aR, aB, aT, b, x0):
        aC_safe = jnp.where(aC == 0.0, 1.0, aC)

        def sweep(_, x):
            x = halo_exchange_x(x, "x")
            xW = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))[:, :]
            xE = jnp.pad(x[1:, :], ((0, 1), (0, 0)))[:, :]
            xS = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
            xN = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
            ax = aC * x + aL * xW + aR * xE + aB * xS + aT * xN
            r = b - ax
            # interior-only update; ghosts refreshed next sweep
            upd = x + 0.8 * r / aC_safe
            x = x.at[1:-1, :].set(upd[1:-1, :])
            return x

        x = lax.fori_loop(0, n_iter, sweep, x0)
        x = halo_exchange_x(x, "x")
        # residual norm over all shards
        xW = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
        xE = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
        xS = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
        xN = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
        r = b - (aC * x + aL * xW + aR * xE + aB * xS + aT * xN)
        res = jnp.sqrt(lax.psum(jnp.sum(r[1:-1, :] ** 2), "x"))
        return x, res

    return solve
