"""Device mesh + sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(train_dsec.py:113): replicate model, scatter batch, NCCL gather. The TPU-native
equivalent is sharding annotations over a jax Mesh: the batch dim is sharded on the
'data' axis, params are replicated, and XLA emits the gradient psum over ICI when
the jitted train step runs — no user-level collectives.

Axes 'model' and 'pipe' are reserved for tensor/pipeline parallelism; at this
model's scale (SURVEY.md §2.5) data parallelism alone reaches parity, so those
axes default to 1 but the plumbing is shape-generic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data','model','pipe') mesh; data axis defaults to all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (model * pipe) == 0, f"{n} devices not divisible by {model * pipe}"
        data = n // (model * pipe)
    assert data * model * pipe == n, (
        f"mesh {data}x{model}x{pipe} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, model, pipe)
    return Mesh(arr, axis_names=("data", "model", "pipe"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf fully replicated on the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every array in the batch along its leading dim over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)
