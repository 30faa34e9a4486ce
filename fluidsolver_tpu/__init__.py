"""fluidsolver_tpu — a TPU-native incompressible two-phase Navier-Stokes framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference C++
solver (gidonbauer/FluidSolver): staggered MAC-grid finite differences, VOF/PLIC
interface capture with ELVIRA reconstruction, curvature-based surface tension,
immersed boundaries, and a pressure-Poisson projection — all as pure, jittable
array programs that XLA can fuse and shard over TPU meshes.

Key deviations from the reference (deliberate, TPU-first):
  * no IRL: PLIC geometry is 2D-native vectorized polygon clipping
  * no HYPRE: the pressure Poisson solve is an on-device PCG with a
    geometric-multigrid preconditioner
  * no OpenMP execution layer: parallelism comes from XLA vectorization on a
    single chip and jax.sharding over a device mesh across chips
"""

import os as _os

# Persistent XLA compilation cache: the VOF clip pipeline and the MG-PCG
# V-cycles are expensive to compile; caching amortizes it across processes.
# MUST go through jax.config.update: the env vars are only read at jax
# import, and virtually every entry point imports jax before this package
# (round-3 postmortem: the cache dir had never been created — every bench
# attempt recompiled the 1024^2 step from scratch and timed out).
_CACHE_DIR = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "fluidsolver_tpu_xla"),
)
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - ancient jax
    pass

from fluidsolver_tpu.version import __version__

__all__ = ["__version__", "enable_x64", "default_dtype"]


def enable_x64() -> None:
    """Enable float64 globally. Required for the 1e-12-tolerance VOF
    conservation invariants (reference: test/ConstantVelocityVOF.cpp:40-64).

    On TPU, f64 is software emulated; production runs use f32/bf16 instead.
    """
    import jax

    jax.config.update("jax_enable_x64", True)


def default_dtype():
    """The default floating dtype: f64 when x64 is enabled, else f32."""
    import jax
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
