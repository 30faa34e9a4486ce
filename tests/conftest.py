import os

# Force the CPU backend with 8 virtual devices BEFORE jax initializes, so the
# multi-chip sharding tests run everywhere (incl. machines with a TPU attached).
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The VOF conservation invariants are checked to 1e-12 (BASELINE.md) -> f64.
jax.config.update("jax_enable_x64", True)
