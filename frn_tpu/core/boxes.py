"""Box geometry: pairwise IoU, delta encode/decode, image clipping.

Pure jnp, fully vectorized, safe under vmap/jit. Semantics replicated from the
reference: IoU (retinanet/losses.py calc_iou), decode (retinanet/utils.py
BBoxTransform.forward), clip (utils.py ClipBoxes.forward), encode
(losses.py:141-152 regression-target construction).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

DEFAULT_STD = (0.1, 0.1, 0.2, 0.2)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between (N,4) and (M,4) corner-format boxes -> (N, M).

    Union is clamped to >=1e-8 like the reference (losses.py calc_iou), which keeps
    degenerate zero-area padded boxes finite.
    """
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])  # (M,)
    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0])
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1])
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    union = jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-8)
    return inter / union


def _to_center(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(
    anchors: jnp.ndarray,
    gt: jnp.ndarray,
    std: Sequence[float] = DEFAULT_STD,
    min_size: float = 1.0,
) -> jnp.ndarray:
    """Regression targets (dx, dy, log dw, log dh) / std for gt boxes vs anchors.

    gt widths/heights clamped to >= min_size before the log, per losses.py:147-148.
    Shapes: anchors (...,4), gt (...,4) broadcastable -> (...,4).
    """
    acx, acy, aw, ah = _to_center(anchors)
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], min_size)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], min_size)
    gcx = gt[..., 0] + 0.5 * (gt[..., 2] - gt[..., 0])
    gcy = gt[..., 1] + 0.5 * (gt[..., 3] - gt[..., 1])

    std = jnp.asarray(std, dtype=anchors.dtype)
    dx = (gcx - acx) / aw / std[0]
    dy = (gcy - acy) / ah / std[1]
    dw = jnp.log(gw / aw) / std[2]
    dh = jnp.log(gh / ah) / std[3]
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    anchors: jnp.ndarray,
    deltas: jnp.ndarray,
    std: Sequence[float] = DEFAULT_STD,
) -> jnp.ndarray:
    """Invert encode_boxes: predicted deltas + anchors -> corner boxes.

    Matches BBoxTransform.forward (utils.py:103-126): deltas are multiplied by std
    (mean 0) before applying.
    """
    acx, acy, aw, ah = _to_center(anchors)
    std = jnp.asarray(std, dtype=deltas.dtype)
    dx = deltas[..., 0] * std[0]
    dy = deltas[..., 1] * std[1]
    dw = deltas[..., 2] * std[2]
    dh = deltas[..., 3] * std[3]

    pcx = acx + dx * aw
    pcy = acy + dy * ah
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, image_shape: Tuple[int, int]) -> jnp.ndarray:
    """Clamp x1,y1 >= 0 and x2 <= W, y2 <= H (utils.py ClipBoxes.forward)."""
    h, w = image_shape
    x1 = jnp.maximum(boxes[..., 0], 0.0)
    y1 = jnp.maximum(boxes[..., 1], 0.0)
    x2 = jnp.minimum(boxes[..., 2], float(w))
    y2 = jnp.minimum(boxes[..., 3], float(h))
    return jnp.stack([x1, y1, x2, y2], axis=-1)
