"""Profiling / tracing hooks.

The reference has no profiling beyond wall-clock prints (train_dsec.py:26-31).
Here: jax.profiler trace capture as a context manager (viewable in TensorBoard /
Perfetto), a step timer that respects the axon relay's no-op block_until_ready
(sync via a 1-element host fetch), and a simple metrics logger.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace around the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: Any) -> None:
    """Barrier that works through the axon relay: fetch 1 element of some leaf."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jnp.ravel(leaves[0])[:1])


class StepTimer:
    """Rolling per-step wall-clock stats (mean/p50/p90) with proper device sync."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples: list = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result_tree: Any = None) -> float:
        if result_tree is not None:
            sync(result_tree)
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "steps_per_s": float(1.0 / a.mean()),
        }


class MetricsLogger:
    """Append-only JSONL metrics sink (the reference only has stdout prints)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "time": time.time(), **{
            k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()
        }}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
