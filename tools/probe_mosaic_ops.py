"""Probe: which parity-compaction/expansion ops does Mosaic TPU support?

The single-launch V-cycle kernel needs, inside a pallas TPU kernel:
  (a) sublane (row) stride-2 extract:  x[0::2, :]
  (b) lane (col)    stride-2 extract:  x[:, 0::2]
  (c) reshape-based lane parity:       x.reshape(R, M//2, 2)[..., 0]
  (d) row 2x repeat (upsample):        jnp.repeat(x, 2, axis=0)
  (e) lane 2x repeat (upsample):       jnp.repeat(x, 2, axis=1)
  (f) row interleave via reshape:      stack/reshape pattern
Each is tried in its own tiny pallas_call on the real TPU; prints
ok/FAIL per op so the kernel design can use only supported primitives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _try(name, kernel, out_shape, x, expect):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(f)(x))
        ok = np.array_equal(out, np.asarray(expect))
        print(f"{name}: {'ok' if ok else 'WRONG VALUES'}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL - {type(e).__name__}: {msg}")
        return False


def main():
    R, M = 64, 256
    x = jnp.asarray(np.random.default_rng(0).normal(size=(R, M)),
                    jnp.float32)
    xn = np.asarray(x)

    def k_row_stride(xr, o):
        o[:] = xr[:][0::2, :]

    _try("(a) row stride-2", k_row_stride, (R // 2, M), x, xn[0::2, :])

    def k_lane_stride(xr, o):
        o[:] = xr[:][:, 0::2]

    _try("(b) lane stride-2", k_lane_stride, (R, M // 2), x, xn[:, 0::2])

    def k_lane_reshape(xr, o):
        o[:] = xr[:].reshape(R, M // 2, 2)[:, :, 0]

    _try("(c) lane reshape parity", k_lane_reshape, (R, M // 2), x,
         xn.reshape(R, M // 2, 2)[:, :, 0])

    def k_row_repeat(xr, o):
        o[:] = jnp.repeat(xr[:], 2, axis=0)

    _try("(d) row repeat 2x", k_row_repeat, (2 * R, M), x,
         np.repeat(xn, 2, axis=0))

    def k_lane_repeat(xr, o):
        o[:] = jnp.repeat(xr[:], 2, axis=1)

    _try("(e) lane repeat 2x", k_lane_repeat, (R, 2 * M), x,
         np.repeat(xn, 2, axis=1))

    def k_row_reshape(xr, o):
        v = xr[:]
        o[:] = v.reshape(R // 2, 2, M)[:, 0, :]

    _try("(f) row reshape parity", k_row_reshape, (R // 2, M), x,
         xn.reshape(R // 2, 2, M)[:, 0, :])

    # (g) roll-and-mask based lane compaction fallback probe:
    # even lanes of x gathered to lanes [0, M/2) using binary doubling rolls
    def k_lane_compact_roll(xr, o):
        v = xr[:]
        jj = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
        # step 1: bring even lanes left by (j/2): log2(M) masked rolls
        acc = jnp.where(jj % 2 == 0, v, 0.0)
        shift = 1
        while shift < M // 2:
            # lanes with bit set in (target distance) move left by shift
            dist = jj // 2 * 0 + 0  # placeholder; this probe just checks roll
            shift *= 2
        o[:] = acc[:, : M // 2] * 0.0 + acc[:, : M // 2]

    # (h) strided STORE into lanes: o[:, 0::2] = v
    def k_lane_scatter(xr, o):
        v = xr[:][:, : M // 2]
        o[:, 0::2] = v
        o[:, 1::2] = v

    _try("(h) lane stride-2 store", k_lane_scatter, (R, M), x,
         np.repeat(xn[:, : M // 2], 2, axis=1))

    # (i) dynamic-length fori with per-band DMA start already covered by
    # existing kernels; skip.


if __name__ == "__main__":
    main()
