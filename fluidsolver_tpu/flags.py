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

import os

_PALLAS_FLAGS = (
    "FS_PALLAS_VCYCLE",
    "FS_PALLAS_RAP",
    "FS_PALLAS_CG",
    "FS_PALLAS_MOMENTUM",
    "FS_PALLAS_TAIL",
    "FS_PALLAS_VOF",
)


def pallas_platform_ok() -> bool:
    """True iff fused Pallas kernels can run here: TPU backend, one device.

    Calling this initializes the jax backend; all call sites are at
    trace/setup time where that has already happened.
    """
    import jax

    return jax.default_backend() == "tpu" and jax.device_count() == 1


def pallas_requested(name: str) -> bool:
    """Resolve one FS_PALLAS_* flag: explicit env wins, else default-on
    when the platform supports the kernels at all."""
    assert name in _PALLAS_FLAGS, name
    v = os.environ.get(name)
    if v is not None:
        return v == "1"
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
