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
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

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


def torch_clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics: scale by
    min(1, max_norm / (global_norm + 1e-6)) — the 1e-6 denominator epsilon is
    torch's, and matters for trajectory-level parity because the clip is active
    on every early-training step (detection losses at init give grad norms far
    above 0.1)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init, update)


class ReferenceAccumState(NamedTuple):
    mini_step: jnp.ndarray  # int32, micro-batches since the last optimizer step
    acc_grads: Any  # running clipped gradient sum
    inner_state: Any


def reference_grad_accumulation(
    inner: optax.GradientTransformation, every_k: int, clip_norm: float
) -> optax.GradientTransformation:
    """Gradient accumulation with the reference trainer's EXACT semantics.

    The reference (train_dsec.py:155-163) calls loss.backward() every
    micro-batch — which SUMS gradients into .grad — then clip_grad_norm_(0.1)
    on the RUNNING SUM, and optimizer.step() every `every_k` micro-batches. The
    effective gradient is therefore clip(clip(g1) + g2), not
    clip(mean(g1, g2)): whenever any micro-gradient's norm exceeds clip_norm
    (always, early in training) the two measurably diverge, with the later
    micro-batches dominating the clipped direction. optax.MultiSteps averages
    and would clip once at the boundary, so it cannot express this recipe.

    Skipped-batch semantics note (deliberate difference, see
    tests/test_whole_model_parity.py trajectory test): the reference's
    try/except `continue` (train_dsec.py:178-180) does NOT advance its
    num_batches counter on a failed step, while the branchless safe-step guard
    feeds zero gradients and DOES advance mini_step — a zero-grad micro-batch
    still counts toward the accumulation boundary here.
    """
    clip = torch_clip_by_global_norm(clip_norm)

    def init(params):
        return ReferenceAccumState(
            mini_step=jnp.zeros((), jnp.int32),
            acc_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
            inner_state=inner.init(params),
        )

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(jnp.add, state.acc_grads, grads)
        acc, _ = clip.update(acc, optax.EmptyState())
        boundary = (state.mini_step + 1) % every_k == 0
        inner_updates, new_inner = inner.update(acc, state.inner_state, params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(boundary, u, jnp.zeros_like(u)), inner_updates
        )
        new_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(boundary, n, o), new_inner, state.inner_state
        )
        new_acc = jax.tree_util.tree_map(
            lambda a: jnp.where(boundary, jnp.zeros_like(a), a), acc
        )
        return updates, ReferenceAccumState(state.mini_step + 1, new_acc, new_inner)

    return optax.GradientTransformation(init, update)


def make_optimizer(config: FrameworkConfig) -> optax.GradientTransformation:
    tc = config.train
    inner_parts = [
        optax.inject_hyperparams(optax.adam)(learning_rate=tc.learning_rate),
    ]
    if tc.warmup_steps > 0:
        # linear warmup multiplier on top of the (plateau-scheduled) base lr
        warmup = tc.warmup_steps
        inner_parts.append(
            optax.scale_by_schedule(lambda count: jnp.minimum(1.0, (count + 1) / warmup))
        )
    inner = optax.chain(*inner_parts)
    if tc.accum_steps > 1:
        # clip is applied to the running micro-gradient sum INSIDE the
        # accumulator (reference semantics, see reference_grad_accumulation)
        return reference_grad_accumulation(inner, tc.accum_steps, tc.grad_clip_norm)
    return optax.chain(torch_clip_by_global_norm(tc.grad_clip_norm), inner)


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

    wire = config.train.input_wire
    if wire not in ("f32", "compact", "events"):
        raise ValueError(f"unknown TrainConfig.input_wire {wire!r}")
    rgb_mean = jnp.asarray(config.geometry.rgb_mean, jnp.float32)
    rgb_std = jnp.asarray(config.geometry.rgb_std, jnp.float32)

    def loss_fn(params, batch_stats, batch, rng):
        if wire == "events":
            # raw-stream wire (DSECDetDataset(events_wire=True)): the device
            # rasterizes the padded x/y/t/p streams into the signed count voxel
            # (exact vs the host voxelizer — integer binning, 3-way agreement
            # tested) and applies the conditional tanh squash; the host ships
            # ~13 B/event and does ZERO per-sample voxelization work
            from frn_tpu.ops.voxelize import (
                normalize_event_voxel_batched,
                voxelize_events_batched,
            )

            geo = config.geometry
            rgb = batch["rgb"].astype(jnp.float32) / 255.0
            if config.train.input_rgb_standardize:
                rgb = (rgb - rgb_mean) / rgb_std
            event = voxelize_events_batched(
                batch["event_x"].astype(jnp.int32),
                batch["event_y"].astype(jnp.int32),
                batch["event_t"],
                batch["event_p"].astype(jnp.int32),
                batch["event_n"],
                num_bins=geo.event_channels,
                height=geo.height,
                width=geo.width,
            )
            event = normalize_event_voxel_batched(event)
        else:
            rgb, event = batch["rgb"], batch["event"]
        if wire == "compact":
            # uint8 RGB + int8 count voxels off a compact_wire=True dataset;
            # the normalization arithmetic is the host pipeline's exactly
            # (dataloader.py:522-534, dsec_data.py:461-462), fused into the
            # step's input graph — see eval/detections.py make_inference_fn
            from frn_tpu.ops.voxelize import normalize_event_voxel_batched

            rgb = rgb.astype(jnp.float32) / 255.0
            if config.train.input_rgb_standardize:
                rgb = (rgb - rgb_mean) / rgb_std
            event = normalize_event_voxel_batched(event.astype(jnp.float32))
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats},
            rgb, event, train=True,
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
