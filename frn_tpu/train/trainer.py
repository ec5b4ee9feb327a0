"""Epoch-level trainer orchestration.

Mirrors the reference training scripts' control flow (train_dsec.py:126-200,
train_dsec_det_fast.py:285-545): running-mean loss window, per-epoch plateau
scheduling on mean epoch loss, periodic + best-mAP checkpointing, optional
periodic evaluation — on top of the jitted train step and a sharded mesh.
"""

from __future__ import annotations

import collections
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from frn_tpu.config import FrameworkConfig
from frn_tpu.data.loader import BatchLoader, device_prefetch
from frn_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from frn_tpu.train.checkpoint import CheckpointManager
from frn_tpu.train.loop import create_train_state, make_train_step, set_learning_rate
from frn_tpu.train.plateau import ReduceLROnPlateau


class Trainer:
    def __init__(
        self,
        config: FrameworkConfig,
        dataset,
        checkpoint_dir: Optional[str] = None,
        eval_fn: Optional[Callable] = None,  # (model, state) -> mAP float
        eval_every: int = 5,
        log_every: int = 50,
        use_mesh: bool = True,
        seed: Optional[int] = None,
        metrics_path: Optional[str] = None,
        transform: Optional[Callable] = None,  # per-sample host augmentation
    ):
        self.config = config
        self.dataset = dataset
        self.transform = transform
        self.eval_fn = eval_fn
        self.eval_every = eval_every
        self.log_every = log_every

        seed = config.train.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        self.model, self.state, self.tx = create_train_state(config, rng)
        self.step_fn = make_train_step(self.model, self.tx, config)
        self.scheduler = ReduceLROnPlateau(
            base_lr=config.train.learning_rate,
            factor=config.train.plateau_factor,
            patience=config.train.plateau_patience,
        )
        self.loss_window = collections.deque(maxlen=100)
        self.epoch = 0
        self.best_map = -1.0
        self._rng = jax.random.PRNGKey(seed + 1)

        n_dev = len(jax.devices())
        self.mesh = (
            make_mesh()
            if use_mesh and n_dev > 1 and config.train.batch_size % n_dev == 0
            else None
        )
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)

        self.ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
        self.history: list = []

        from frn_tpu.utils.profiling import MetricsLogger, StepTimer

        self.metrics = MetricsLogger(metrics_path)
        self.timer = StepTimer()

    def resume(self) -> bool:
        """Restore the latest checkpoint if present (train_dsec.py:98-104)."""
        if self.ckpt is None or self.ckpt.latest_epoch() is None:
            return False
        self.state, meta = self.ckpt.restore(self.state)
        self.epoch = int(meta.get("epoch", 0))
        self.best_map = float(meta.get("best_map", -1.0))
        self.history = list(meta.get("loss_history", []))
        if "scheduler" in meta:
            self.scheduler.load_state_dict(meta["scheduler"])
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, self.scheduler.lr)
            )
        return True

    def _loader(self) -> BatchLoader:
        tc = self.config.train
        return BatchLoader(
            self.dataset, self.config.geometry, batch_size=tc.batch_size,
            shuffle=True, num_threads=8, max_annots=tc.max_annots_per_image,
            drop_last=True, seed=tc.seed + self.epoch, transform=self.transform,
        )

    def train_epoch(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        it = device_prefetch(iter(self._loader()), size=2, sharding=sharding)
        # device metrics are held only until the next log window, then fetched in
        # one transfer and released — bounded memory at any epoch length (tens of
        # thousands of live tiny device arrays would otherwise pile up)
        pending = []
        loss_sum, loss_n, skipped, num_steps = 0.0, 0, 0.0, 0
        t_window = time.perf_counter()

        def drain():
            """Fetch all pending device metrics in one transfer; returns the
            last window entry (host copy) so the log line reuses it instead of
            paying a second ~25 ms relay round trip."""
            nonlocal pending, loss_sum, loss_n, skipped, num_steps
            if not pending:
                return None
            host = jax.device_get(pending)
            pending = []
            for m in host:
                num_steps += 1
                skipped += float(m["skipped"])
                loss = float(m["loss"])
                if np.isfinite(loss):
                    loss_sum += loss
                    loss_n += 1
            return host[-1]

        for i, batch in enumerate(it):
            self._rng, step_rng = jax.random.split(self._rng)
            self.state, metrics = self.step_fn(self.state, batch, step_rng)
            pending.append(metrics)
            if self.log_every and (i + 1) % self.log_every == 0:
                last = drain()  # one host sync per log window
                loss = float(last["loss"])
                dt = (time.perf_counter() - t_window) / self.log_every
                t_window = time.perf_counter()
                self.loss_window.append(loss)
                print(
                    f"epoch {self.epoch} iter {i + 1}: cls {float(last['cls_loss']):.5f} "
                    f"reg {float(last['reg_loss']):.5f} "
                    f"running {np.mean(self.loss_window):.5f} ({dt * 1e3:.0f} ms/step)",
                    flush=True,
                )
                self.metrics.log(
                    int(self.state.step), epoch=self.epoch,
                    loss=loss, cls_loss=float(last["cls_loss"]),
                    reg_loss=float(last["reg_loss"]), step_time_s=dt,
                )
        drain()

        mean_loss = loss_sum / loss_n if loss_n else float("nan")
        return {
            "mean_loss": mean_loss,
            "skipped": skipped,
            "epoch_time_s": time.perf_counter() - t0,
            "num_steps": num_steps,
        }

    def fit(self, epochs: Optional[int] = None) -> list:
        epochs = epochs if epochs is not None else self.config.train.epochs
        tc = self.config.train
        while self.epoch < epochs:
            stats = self.train_epoch()
            self.epoch += 1
            self.history.append(stats["mean_loss"])

            lr = self.scheduler.step(stats["mean_loss"])
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr)
            )
            skipped = (
                f" skipped {int(stats['skipped'])}/{stats['num_steps']}"
                if stats["skipped"] else ""
            )
            print(
                f"epoch {self.epoch}/{epochs}: loss {stats['mean_loss']:.5f} "
                f"lr {lr:.2e} ({stats['epoch_time_s']:.1f}s){skipped}",
                flush=True,
            )

            current_map = None
            if self.eval_fn is not None and self.epoch % self.eval_every == 0:
                current_map = float(self.eval_fn(self.model, self.state))
                print(f"epoch {self.epoch}: mAP {current_map:.4f}", flush=True)
                if current_map > self.best_map:
                    self.best_map = current_map
                    if self.ckpt:
                        self._save(best=True)

            if self.ckpt and self.epoch % tc.checkpoint_every == 0:
                self._save()
        if self.ckpt:
            self._save()
        return self.history

    def _save(self, best: bool = False):
        meta = {
            "loss_history": self.history,
            "scheduler": self.scheduler.state_dict(),
            "best_map": self.best_map,
            "variant": self.config.model.variant,
            "dataset": self.config.geometry.name,
        }
        self.ckpt.save(self.epoch, jax.device_get(self.state), meta=meta)
