"""Training loop: optax Adam + grad clip + gradient accumulation + safe steps.

Re-implements the reference trainers' optimization recipe (train_dsec.py:122-163,
train_dsec_det_fast.py:159-282) as one jitted train step:

  * Adam (lr from config), gradient L2-norm clip (0.1 / 1.0 in the reference)
  * optimizer step every `accum_steps` micro-batches (optax.MultiSteps)
  * learning rate mutable from host (inject_hyperparams) for the per-epoch
    ReduceLROnPlateau schedule
  * safe-step guards: a micro-batch whose loss is non-finite or above a threshold
    contributes zero gradients (replaces the reference's try/except-skip,
    train_dsec_det_fast.py:226-258) — branchless, so the step stays compiled
  * RGB modality dropout handled inside the model via the 'modality' RNG stream

bf16 note: on TPU the model can run bf16 activations (ModelConfig.compute_dtype)
with f32 master params; no loss scaling is needed (unlike the reference's AMP
GradScaler, train_dsec_det_fast.py:240-269) because bf16 has f32's exponent range.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from frn_tpu.config import FrameworkConfig
from frn_tpu.models.detector import FRNDetector, detection_loss


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def make_optimizer(config: FrameworkConfig) -> optax.GradientTransformation:
    tc = config.train
    parts = [
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=tc.learning_rate),
    ]
    if tc.warmup_steps > 0:
        # linear warmup multiplier on top of the (plateau-scheduled) base lr
        warmup = tc.warmup_steps
        parts.append(
            optax.scale_by_schedule(lambda count: jnp.minimum(1.0, (count + 1) / warmup))
        )
    inner = optax.chain(*parts)
    if tc.accum_steps > 1:
        return optax.MultiSteps(inner, every_k_schedule=tc.accum_steps)
    return inner


def set_learning_rate(opt_state, lr: float):
    """Write a new lr into the (possibly MultiSteps-wrapped) inject_hyperparams state."""
    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in getattr(s, "hyperparams", {}):
            s.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
            return True
        if isinstance(s, (tuple, list)):
            return any(visit(x) for x in s)
        if dataclasses.is_dataclass(s):
            return any(visit(getattr(s, f.name)) for f in dataclasses.fields(s))
        return False

    visit(opt_state)
    return opt_state


def create_train_state(
    config: FrameworkConfig, rng: jax.Array, batch_size: Optional[int] = None
) -> Tuple[FRNDetector, TrainState, optax.GradientTransformation]:
    from frn_tpu.models.detector import init_detector

    model, variables = init_detector(config, rng, batch_size or config.train.batch_size)
    tx = make_optimizer(config)
    params = variables["params"]
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return model, state, tx


def make_train_step(
    model: FRNDetector,
    tx: optax.GradientTransformation,
    config: FrameworkConfig,
    loss_skip_threshold: Optional[float] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    loss_skip_threshold defaults to config.train.loss_skip_threshold; None means
    only non-finite losses are skipped.
    """
    if loss_skip_threshold is None:
        loss_skip_threshold = config.train.loss_skip_threshold

    def loss_fn(params, batch_stats, batch, rng):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["rgb"], batch["event"], train=True,
            rngs={"modality": rng},
        )
        cls_loss, reg_loss = detection_loss(cls, reg, batch["annot"], config)
        return cls_loss + reg_loss, (cls_loss, reg_loss)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        (loss, (cls_loss, reg_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)

        # safe step: non-finite (and optionally exploding) loss contributes nothing
        ok = jnp.isfinite(loss)
        if loss_skip_threshold is not None:
            ok = ok & (loss < loss_skip_threshold)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=state.batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "cls_loss": cls_loss,
            "reg_loss": reg_loss,
            "skipped": (~ok).astype(jnp.float32),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
