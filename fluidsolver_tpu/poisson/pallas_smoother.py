"""Pallas TPU kernel: fused red-black Gauss-Seidel sweep.

One V-cycle spends most of its time in RB sweeps; in pure XLA each color
update is several HBM round trips (shifted reads + select). This kernel
keeps the five coefficient arrays, b, and x resident in VMEM and performs
the red and black updates in a single launch — one HBM read/write per
array per sweep.

Scope: whole-array blocks (no tiling), so it applies to levels whose
working set fits in VMEM (~16 MB/core -> up to ~512^2 f32 boxes). The MG
driver uses it for every level that fits and falls back to the XLA path
above that. Kernel language per the Pallas TPU guide; no halos are needed
because the shifted neighbors are formed in-register from the VMEM block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # conservative slice of ~16 MB/core


def _fits_vmem(shape, dtype) -> bool:
    # 8 arrays live in the kernel (5 coeffs + b + x in/out)
    return 8 * int(np.prod(shape)) * jnp.dtype(dtype).itemsize < VMEM_BUDGET_BYTES


def _sweep_kernel(red_first: bool, aC, aL, aR, aB, aT, b, x_in, x_out):
    x = x_in[:]
    n, m = x.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    red = ((ii + jj) % 2) == 0
    aC_safe = jnp.where(aC[:] == 0.0, 1.0, aC[:])

    def color_update(x, mask):
        xW = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
        xE = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
        xS = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
        xN = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
        ax_off = aL[:] * xW + aR[:] * xE + aB[:] * xS + aT[:] * xN
        return jnp.where(mask, (b[:] - ax_off) / aC_safe, x)

    first = red if red_first else ~red
    x = color_update(x, first)
    x = color_update(x, ~first)
    x_out[:] = x


def rb_sweep_pallas(op, x, b, reverse: bool = False, interpret: bool = False):
    """Fused red-black sweep; same math as mg._rb_sweep."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = partial(_sweep_kernel, not reverse)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[spec] * 7,
        out_specs=spec,
        interpret=interpret,
    )(op.aC, op.aL, op.aR, op.aB, op.aT, b, x)


def sweep_available(shape, dtype, backend: str | None = None) -> bool:
    """True when the Pallas path applies (TPU backend + VMEM fit)."""
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and _fits_vmem(shape, dtype)
