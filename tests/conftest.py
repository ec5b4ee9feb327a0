"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware, and full-precision matmuls so golden-value comparisons are
exact. Must run before any test module imports jax."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon site hook re-forces JAX_PLATFORMS=axon; override at the config level
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU cache
# entries embed host machine features and reloading them can SIGILL/abort
# (frn_tpu/utils/cache.py gates it to TPU backends for the same reason).
