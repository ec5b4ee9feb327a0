"""Orbax checkpointing with the reference's logical schema.

The reference saves {epoch, model_state_dict, optimizer_state_dict, loss[, map,
best_map, ...]} (train_dsec.py:197-200, train_dsec_det_fast.py:525-545). Here the
same logical content is stored as an orbax composite: model params + frozen batch
stats ("model"), optimizer state ("opt"), and a json-able metadata dict ("meta"
with epoch, loss history, scheduler state, config fingerprint, best mAP).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from frn_tpu.train.loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(
        self,
        epoch: int,
        state: TrainState,
        meta: Optional[Dict[str, Any]] = None,
        wait: bool = True,
    ) -> None:
        meta = dict(meta or {})
        meta["epoch"] = epoch
        payload = {
            "model": {"params": state.params, "batch_stats": state.batch_stats},
            "opt": state.opt_state,
            "step": np.asarray(state.step),
        }
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state_template: TrainState, epoch: Optional[int] = None
    ) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore into the shape/dtype structure of `state_template`."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "model": {
                "params": state_template.params,
                "batch_stats": state_template.batch_stats,
            },
            "opt": state_template.opt_state,
            "step": np.asarray(state_template.step),
        }
        out = self._mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        payload, meta = out["state"], out["meta"]
        state = TrainState(
            params=payload["model"]["params"],
            batch_stats=payload["model"]["batch_stats"],
            opt_state=payload["opt"],
            step=jax.numpy.asarray(payload["step"]),
        )
        return state, meta

    def close(self):
        self._mgr.close()
