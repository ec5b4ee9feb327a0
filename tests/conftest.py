"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware, and full-precision matmuls so golden-value comparisons are
exact. Must run before any test module imports jax."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 8 collective participants time-share this host's core(s); on a 1-core VM
    # the skew between participant threads can exceed XLA:CPU's default
    # rendezvous terminate timeout, which hard-aborts the process mid-suite
    # (observed on the full-geometry mesh train step). The collectives are not
    # actually stuck — raise the guard well past worst-case scheduling skew.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the axon site hook re-forces JAX_PLATFORMS=axon; override at the config level
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU cache
# entries embed host machine features and reloading them can SIGILL/abort
# (frn_tpu/utils/cache.py gates it to TPU backends for the same reason).
