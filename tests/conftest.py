import os

# Force the CPU backend with 8 virtual devices BEFORE jax initializes, so the
# multi-chip sharding tests run everywhere (incl. machines with a TPU attached).
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The VOF conservation invariants are checked to 1e-12 (BASELINE.md) -> f64.
jax.config.update("jax_enable_x64", True)
# Persistent-cache WRITES are disabled under pytest: executable.serialize()
# segfaults deterministically on one large two-phase executable late in a
# long-lived suite process (reproduced twice at test_sources.py with a
# fresh cache, 2026-08-21; exit 139 in jax compilation_cache
# put_executable_and_time). The min-compile-time gate skips the whole
# write path BEFORE serialization; cache READS (entries written by
# production/tool runs) still work. Import the package FIRST — its
# __init__ sets this flag to 2.0 and would override a bare update here.
import fluidsolver_tpu  # noqa: E402,F401

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
