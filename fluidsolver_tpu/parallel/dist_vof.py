"""Sharded SPARSE VOF advection: shard_map + per-shard lane compaction.

Round-3 forced the dense VOF path under any mesh (solvers/twophase.py):
the sparse path's global lane indices make GSPMD all-gather full fields at
every gather/scatter, but dense advection costs 5.5x the sparse path at
1024^2 (429 vs 78.5 ms single-chip, PERF.md) — multi-chip was a perf
regression by construction. This module removes that forcing the standard
stencil way (same scheme as parallel/pallas_shard.py):

  1. all fields are row-padded to a COMMON per-shard row count ``r`` and
     sharded P("x", None) — one consistent global row window per shard;
  2. inside ``shard_map``, each shard extends its slab by ``w`` halo rows
     per side via ``lax.ppermute`` (mesh edges receive zeros — beyond the
     global array, unreachable for owned-cell math);
  3. the UNCHANGED sparse kernel (vof/advect._advect_sparse) runs on the
     extended slab with a per-shard lane budget and a ``ShardView``:
     lanes are compacted from the shard's OWNED cells only, coordinate
     lookups use global indices, and the RK4 backtrace samples with the
     GLOBAL domain clamp (stencil.sample_centered_stack x_clamp) so
     constant extrapolation at physical boundaries matches single-device;
  4. each shard returns its own rows; the maximum volume error is a
     ``pmax``. Lane overflow stays a loud ``inf``.

Halo width: classify + 3x3 neighbor gathers need 1 row; the CFL-bounded
RK4 backtrace reads bilinear corners within 2 rows of the cell
(dt*|u| <= cfl*dx < dx, ops/momentum.adjust_dt). w = 4 covers both with
margin. Differences vs the single-device sparse path are pure float noise
(the sampler's shard-shifted origin can flip a floor() at cell-boundary
points by 1 ulp — bilinear is continuous there).

Reference seam: ghost-cell BC application is where the reference's
shared-memory code would gain halo exchange
(src/BoundaryConditions.hpp:203-224); the dynamic-schedule mixed-cell loop
(src/VOF.hpp:318-332) is what the per-shard lane compaction re-creates
under domain decomposition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from fluidsolver_tpu.parallel.dist_poisson import AXIS, _extend_x
from fluidsolver_tpu.vof.plic import Plic

HALO = 4


class ShardView:
    """Shard-local view passed into vof/advect._advect_sparse: local row 0
    sits at global padded row ``row_off``; the shard owns global interior
    cells [own_lo, own_hi) (clipped to the grid inside)."""

    def __init__(self, row_off, own_lo, own_hi):
        self.row_off = row_off
        self.own_lo = own_lo
        self.own_hi = own_hi


def plan_rows(grid, U_rows: int, ndev: int):
    """(r, R_tot): common per-shard row count over all field layouts (the
    U array, nx+3 rows, is the tallest) and the padded total."""
    r = -(-U_rows // ndev)
    return r, r * ndev


def available(grid, ndev: int) -> bool:
    """The scheme needs the halo to fit inside one shard's rows."""
    r, _ = plan_rows(grid, grid.nx + 3, ndev)
    return r > HALO + 1


def _advect_local(grid, m_shard: int, r: int, no_correction: bool,
                  vf, pnx, pny, pd, valid, U, V, Ui, Vi, dt):
    from fluidsolver_tpu.vof import advect as adv

    s = lax.axis_index(AXIS)
    row_off = s * r - HALO
    vf_e, pnx_e, pny_e, pd_e, valid_e, U_e, V_e, Ui_e, Vi_e = (
        _extend_x(a, HALO) for a in (vf, pnx, pny, pd, valid, U, V, Ui, Vi))
    rec = Plic(nx=pnx_e, ny=pny_e, d=pd_e, valid=valid_e,
               overflow=jnp.zeros((), bool))
    shard = ShardView(row_off=row_off,
                      own_lo=s * r - 1, own_hi=(s + 1) * r - 1)
    vf_out, vol_err = adv._advect_sparse(
        vf_e, rec, U_e, V_e, Ui_e, Vi_e, grid, dt, m_shard,
        no_correction=no_correction, shard=shard)
    return vf_out[HALO:HALO + r], lax.pmax(vol_err, AXIS)


def advect_sharded(mesh, vf_old, rec: Plic, U, V, Ui, Vi, grid, dt,
                   m_total: int, no_correction: bool = False):
    """Global-view entry: one unsplit sparse advection over the mesh.

    Same contract as vof/advect.advect (returns (vf_new, max_vol_err);
    ghost values kept); ``m_total`` is the global lane budget, split
    evenly across shards — an interface crowding into one slab overflows
    that shard's budget loudly (inf), exactly like the single-device
    overflow semantics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    ndev = mesh.shape[AXIS]
    r, R_tot = plan_rows(grid, U.shape[0], ndev)
    m_shard = -(-int(m_total) // ndev)
    spec = NamedSharding(mesh, P(AXIS, None))

    def pin(a):
        if isinstance(a, jax.core.Tracer):
            return lax.with_sharding_constraint(a, spec)
        return a

    def padr(a):
        # pin BOTH sides: the row pad changes the GSPMD tile; constrained
        # it lowers to neighbor permutes, unconstrained to an all-gather
        return pin(jnp.pad(pin(a), ((0, R_tot - a.shape[0]), (0, 0))))

    args = [padr(a) for a in (vf_old, rec.nx, rec.ny, rec.d, rec.valid,
                              U, V, Ui, Vi)]
    fn = shard_map(
        partial(_advect_local, grid, m_shard, r, bool(no_correction)),
        mesh=mesh,
        in_specs=(P(AXIS, None),) * 9 + (P(),),
        out_specs=(P(AXIS, None), P()),
        check_vma=False,
    )
    vf_out, vol_err = fn(*args, jnp.asarray(dt, vf_old.dtype))
    return pin(pin(vf_out)[: vf_old.shape[0]]), vol_err
