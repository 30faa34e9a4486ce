"""Fused Pallas smoother under shard_map: the multi-chip x Pallas bridge.

Round-1 left the fast path (fused Pallas kernels) and the multi-chip path
(GSPMD / shard_map) mutually exclusive: ``pallas_call`` does not partition
under GSPMD, so flags.pallas_platform_ok() gates the kernels to single
device. This module reconciles them the standard way for stencil codes:
**shard_map around a per-shard pallas_call with redundant halo compute**.

Scheme (x-slab mesh, same decomposition as parallel/dist_poisson):

1. Extend the local slab of every input plane by ``w`` rows per side from
   the mesh neighbors (``lax.ppermute``; mesh edges receive zeros, which is
   exactly the zero-padded-shift boundary convention the fused kernel's
   inert aC=0 padding implements — see pallas_vcycle.fused_smooth).
2. Run the UNCHANGED single-device kernel on the extended slab. Each
   chained color update consumes one row of halo validity per side (a
   masked Jacobi-from-neighbors update reads a 1-neighborhood), the
   optional residual epilogue one more; ``w`` = that total, rounded up to
   even so the kernel's internal (row+col) checkerboard parity equals the
   global parity (slab sizes are even by construction in dist_poisson's
   Plan, so local parity == global parity; an even halo preserves it).
3. Crop ``w`` rows per side: by the halo-validity induction, the cropped
   interior is exactly the global kernel's rows for this slab.

Cost model: the redundant compute is w extra rows per side per launch
(w <= 5 for a pre+post+residual phase) on slabs of mx ~ N/ndev rows —
sub-percent at production sizes — and the halo traffic is the same
2*w*M*itemsize per neighbor the unfused distributed smoother already pays,
but ONCE per fused phase instead of once per color.

Validated by tests/test_pallas_shard.py on an 8-device CPU mesh in
interpret mode (the driver-host recipe; Mosaic itself needs real TPU).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from fluidsolver_tpu.parallel.dist_poisson import AXIS, _extend_op, _extend_x
from fluidsolver_tpu.poisson.pallas_vcycle import fused_smooth


def halo_width(colors, residual: bool) -> int:
    """Rows of halo validity a fused phase consumes per side, rounded up
    to even (checkerboard-parity preservation)."""
    w = len(colors) + (1 if residual else 0)
    return w + (w % 2)


def fused_smooth_local(op_loc, b_loc, x0_loc=None, colors=(),
                       residual=False, interpret=False):
    """shard_map BODY: one fused smoothing phase on this device's x-slab.

    Drop-in replacement for chaining dist_poisson._sweep_local color
    updates (+ a residual): same math, one pallas_call and one halo
    exchange instead of ~2 XLA launches and one exchange per color.
    Returns x (and r when residual=True), cropped to the local slab.
    """
    w = halo_width(colors, residual)
    op_ext = _extend_op(op_loc, w)
    b_ext = _extend_x(b_loc, w)
    x0_ext = None if x0_loc is None else _extend_x(x0_loc, w)
    out = fused_smooth(op_ext, b_ext, x0=x0_ext, colors=tuple(colors),
                       residual=residual, interpret=interpret)
    if residual:
        return out[0][w:-w], out[1][w:-w]
    return out[w:-w]


def make_sharded_smoother(mesh: Mesh, colors, residual=False,
                          interpret=False):
    """jit-compiled shard_map smoother over ``mesh`` (1D, axis AXIS).

    Takes GLOBAL (N, M) operator planes / b / x0 sharded (or shardable)
    along rows; returns the global smoothed x (and residual). N must be
    divisible by 2 * mesh size (even slabs keep checkerboard parity)."""
    spec = P(AXIS, None)

    def body(op, b, x0):
        return fused_smooth_local(op, b, x0_loc=x0, colors=colors,
                                  residual=residual, interpret=interpret)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so jax's vma checker cannot type it; the specs above state
    # the sharding contract explicitly.
    shmapped = shard_map(body, mesh=mesh,
                         in_specs=(spec, spec, spec),
                         out_specs=(spec, spec) if residual else spec,
                         check_vma=False)
    return jax.jit(shmapped)
