"""Persistent XLA compilation cache.

First compiles of the full detector take minutes (remote-compile TPU tunnels make
this worse); the persistent cache makes every subsequent process start hot. Called
by bench.py, __graft_entry__, and the CLI entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None, allow_cpu: bool = False) -> None:
    """Enable the persistent cache for TPU backends.

    CPU is excluded by default: XLA:CPU caches AOT machine code whose target
    features can mismatch the host (observed here: cached executables built with
    +prefer-no-scatter abort with SIGILL on reload), so on-CPU runs recompile.
    """
    import jax

    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        backend = "unknown"
    if backend not in ("tpu", "axon") and not allow_cpu:
        return

    path = path or os.environ.get(
        "FRN_CACHE_DIR", os.path.expanduser("~/.cache/frn_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
