"""Fused Pallas smoother under shard_map (parallel/pallas_shard.py) on the
8-device CPU mesh, interpret mode — the multi-chip x Pallas reconciliation
prototype (PERF.md "Multi-chip x Pallas" section).

Claims verified:
1. The sharded fused phase equals the single-device fused_smooth on the
   global arrays (halo-redundant compute + crop is exact, incl. mesh-edge
   zero boundaries and checkerboard parity across slab seams).
2. Both equal a plain-XLA chained color-update oracle (same math as
   boxmg._rb_sweep with zero-padded shifts).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fluidsolver_tpu.parallel import pallas_shard
from fluidsolver_tpu.poisson.pallas_vcycle import fused_smooth

from tests.test_dist_poisson import _jump_system


def _mesh():
    return Mesh(np.array(jax.devices()), ("x",))


def _f32(op):
    return dataclasses.replace(
        op, **{f.name: getattr(op, f.name).astype(jnp.float32)
               for f in dataclasses.fields(op)})


def _nb(a, di, dj):
    """out[i, j] = a[i+di, j+dj], zero outside (the kernel's boundary
    convention): neighbor-value gather for the stencil couplings."""
    out = jnp.roll(a, (-di, -dj), (0, 1))
    if di:
        out = out.at[0 if di < 0 else -1, :].set(0.0)
    if dj:
        out = out.at[:, 0 if dj < 0 else -1].set(0.0)
    return out


def _oracle(op, b, x0, colors):
    """Chained masked color updates, plain XLA (== boxmg._rb_sweep math)."""
    ii, jj = jnp.meshgrid(jnp.arange(b.shape[0]), jnp.arange(b.shape[1]),
                          indexing="ij")
    red = (((ii + jj) % 2) == 0).astype(b.dtype)
    aC_safe = jnp.where(op.aC == 0.0, 1.0, op.aC)
    x = x0
    for want_red in colors:
        ax_off = (op.aL * _nb(x, -1, 0) + op.aR * _nb(x, 1, 0)
                  + op.aB * _nb(x, 0, -1) + op.aT * _nb(x, 0, 1))
        x_new = (b - ax_off) / aC_safe
        x = jnp.where((red if want_red else 1.0 - red) > 0.5, x_new, x)
    return x


@pytest.mark.parametrize("colors,residual", [
    ((True, False), False),          # one pre-smoothing phase
    ((True, False, False, True), True),  # pre+post phase + residual epilogue
])
def test_sharded_fused_smooth_matches_global(colors, residual):
    mesh = _mesh()
    op, rhs = _jump_system(62, "right")   # (64, 64) box -> 8-row slabs
    op = _f32(op)
    b = rhs.astype(jnp.float32)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=b.shape), jnp.float32)

    smoother = pallas_shard.make_sharded_smoother(
        mesh, colors, residual=residual, interpret=True)
    out = smoother(op, b, x0)

    ref = fused_smooth(op, b, x0=x0, colors=colors, residual=residual,
                       interpret=True)
    if residual:
        x_sh, r_sh = out
        x_ref, r_ref = ref
        np.testing.assert_array_equal(np.asarray(r_sh), np.asarray(r_ref))
    else:
        x_sh, x_ref = out, ref
    np.testing.assert_array_equal(np.asarray(x_sh), np.asarray(x_ref))

    # cross-check vs the plain-XLA oracle (f32 rounding only)
    x_or = _oracle(op, b, x0, colors)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_or),
                               rtol=0, atol=1e-5)


def test_halo_width_even_parity():
    assert pallas_shard.halo_width((True, False), False) == 2
    assert pallas_shard.halo_width((True, False), True) == 4  # 3 -> even
    assert pallas_shard.halo_width((True,), False) == 2       # 1 -> even
