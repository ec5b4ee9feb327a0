"""Vectorized focal + smooth-L1 detection loss.

The reference iterates over the batch in Python and materializes dynamic-size positive
sets (retinanet/losses.py:42-169). Here the whole loss is a single static-shape
program: annotations arrive padded to a fixed N with class = -1, assignment and both
loss terms are computed with masks, and the batch dimension is vmapped. The numerics
replicate the reference exactly:

  * IoU assignment: < 0.4 background, >= 0.5 positive, in between ignored
    (losses.py:90-91); images with zero valid annotations degenerate to the
    all-background branch (losses.py:46-70) because masked IoU_max = -1 < 0.4 and
    num_positives = 0 (the /max(num_pos,1) normalizer makes both branches identical).
  * focal: alpha=0.25, gamma=2, probabilities clamped to [1e-4, 1-1e-4] (losses.py:47)
  * classification loss = sum / max(num_positives, 1)          (losses.py:121)
  * regression: smooth-L1 with beta=1/9 on (dx,dy,dw,dh)/[.1,.1,.2,.2] targets,
    mean over positive anchors x 4 coords                      (losses.py:141-161)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from frn_tpu.core.boxes import encode_boxes, pairwise_iou

ALPHA = 0.25
GAMMA = 2.0
BETA = 1.0 / 9.0


def _per_image_loss(
    classification: jnp.ndarray,  # (A, K) sigmoid probabilities
    regression: jnp.ndarray,  # (A, 4) raw deltas
    anchors: jnp.ndarray,  # (A, 4)
    annotations: jnp.ndarray,  # (N, 5) [x1,y1,x2,y2,class], padded rows class=-1
    std: Sequence[float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    num_classes = classification.shape[-1]
    cls = jnp.clip(classification.astype(jnp.float32), 1e-4, 1.0 - 1e-4)
    reg = regression.astype(jnp.float32)

    valid = annotations[:, 4] >= 0.0  # (N,)
    iou = pairwise_iou(anchors, annotations[:, :4])  # (A, N)
    iou = jnp.where(valid[None, :], iou, -1.0)
    iou_max = jnp.max(iou, axis=1)  # (A,)
    iou_arg = jnp.argmax(iou, axis=1)  # (A,)

    positive = iou_max >= 0.5
    ignore = (iou_max >= 0.4) & ~positive
    num_pos = jnp.sum(positive.astype(jnp.float32))

    assigned = annotations[iou_arg]  # (A, 5)
    assigned_cls = jnp.clip(assigned[:, 4].astype(jnp.int32), 0, num_classes - 1)
    one_hot = jax.nn.one_hot(assigned_cls, num_classes, dtype=jnp.float32)
    targets = jnp.where(positive[:, None], one_hot, 0.0)  # (A, K)

    # --- focal classification loss ---
    is_pos_target = targets == 1.0
    alpha_factor = jnp.where(is_pos_target, ALPHA, 1.0 - ALPHA)
    focal_weight = jnp.where(is_pos_target, 1.0 - cls, cls)
    focal_weight = alpha_factor * focal_weight ** GAMMA
    bce = -(targets * jnp.log(cls) + (1.0 - targets) * jnp.log(1.0 - cls))
    cls_loss = focal_weight * bce
    cls_loss = jnp.where(ignore[:, None], 0.0, cls_loss)
    cls_loss = jnp.sum(cls_loss) / jnp.maximum(num_pos, 1.0)

    # --- smooth-L1 regression loss over positives ---
    reg_targets = encode_boxes(anchors, assigned[:, :4], std=std)  # (A, 4)
    diff = jnp.abs(reg_targets - reg)
    smooth = jnp.where(diff <= BETA, 0.5 / BETA * diff ** 2, diff - 0.5 * BETA)
    smooth = smooth * positive[:, None]
    # reference uses .mean() over the (num_pos, 4) positive slice
    reg_loss = jnp.sum(smooth) / jnp.maximum(num_pos * 4.0, 1.0)
    reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)

    return cls_loss, reg_loss


def focal_detection_loss(
    classification: jnp.ndarray,  # (B, A, K)
    regression: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    annotations: jnp.ndarray,  # (B, N, 5)
    std: Sequence[float] = (0.1, 0.1, 0.2, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mean (classification_loss, regression_loss) scalars."""
    cls_l, reg_l = jax.vmap(
        lambda c, r, a: _per_image_loss(c, r, anchors, a, std)
    )(classification, regression, annotations)
    return jnp.mean(cls_l), jnp.mean(reg_l)
