"""Independent, loop-based numpy replicas of the reference semantics.

These are intentionally written in the most literal dynamic-shape style (python
loops, boolean masks) so they serve as golden oracles for the vectorized
static-shape TPU implementations. Semantics follow the documented behavior of
/root/reference/retinanet/{anchors,losses,utils,model}.py.
"""

from __future__ import annotations

import math

import numpy as np


def ref_base_anchors(base_size, ratios=(0.5, 1, 2), scales=(1, 2 ** (1 / 3), 2 ** (2 / 3))):
    out = []
    for r in ratios:
        for s in scales:
            side = base_size * s
            area = side * side
            w = math.sqrt(area / r)
            h = w * r
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.array(out)


def ref_all_anchors(image_shape, levels=(2, 3, 4, 5, 6)):
    h, w = image_shape
    rows = []
    for lvl in levels:
        stride = 2 ** lvl
        size = 2 ** (lvl + 2)
        gh, gw = (h + stride - 1) // stride, (w + stride - 1) // stride
        base = ref_base_anchors(size)
        for gy in range(gh):
            for gx in range(gw):
                cx, cy = (gx + 0.5) * stride, (gy + 0.5) * stride
                for b in base:
                    rows.append([b[0] + cx, b[1] + cy, b[2] + cx, b[3] + cy])
    return np.array(rows, dtype=np.float32)


def ref_iou(a, b):
    """(N,4) x (M,4) -> (N,M), union clamped at 1e-8."""
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0])
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1])
            inter = max(iw, 0) * max(ih, 0)
            ua = (
                (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                + (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
                - inter
            )
            out[i, j] = inter / max(ua, 1e-8)
    return out


def ref_nms(boxes, scores, iou_threshold):
    """Greedy NMS (torchvision.ops.nms semantics): returns kept indices, by score."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[oi + 1 :]:
            if suppressed[j]:
                continue
            if ref_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > iou_threshold:
                suppressed[j] = True
    return np.array(keep, dtype=np.int64)


def ref_focal_loss(classification, regression, anchors, annotations):
    """Literal replica of losses.py FocalLoss.forward on numpy.

    classification (B,A,K) probabilities, regression (B,A,4), anchors (A,4),
    annotations (B,N,5) padded with -1 rows. Returns (cls_loss, reg_loss) scalars
    (batch means).
    """
    alpha, gamma = 0.25, 2.0
    bsz = classification.shape[0]
    anchor = anchors
    aw = anchor[:, 2] - anchor[:, 0]
    ah = anchor[:, 3] - anchor[:, 1]
    acx = anchor[:, 0] + 0.5 * aw
    acy = anchor[:, 1] + 0.5 * ah

    cls_losses, reg_losses = [], []
    for j in range(bsz):
        cls = np.clip(classification[j], 1e-4, 1 - 1e-4)
        reg = regression[j]
        ann = annotations[j]
        ann = ann[ann[:, 4] != -1]

        if ann.shape[0] == 0:
            focal_w = (1 - alpha) * cls ** gamma
            bce = -np.log(1 - cls)
            cls_losses.append((focal_w * bce).sum())
            reg_losses.append(0.0)
            continue

        iou = ref_iou(anchor, ann[:, :4])
        iou_max = iou.max(axis=1)
        iou_arg = iou.argmax(axis=1)

        targets = np.full_like(cls, -1.0)
        targets[iou_max < 0.4] = 0.0
        pos = iou_max >= 0.5
        num_pos = pos.sum()
        assigned = ann[iou_arg]
        targets[pos] = 0.0
        targets[pos, assigned[pos, 4].astype(int)] = 1.0

        alpha_f = np.where(targets == 1.0, alpha, 1 - alpha)
        focal_w = np.where(targets == 1.0, 1 - cls, cls)
        focal_w = alpha_f * focal_w ** gamma
        bce = -(targets * np.log(cls) + (1 - targets) * np.log(1 - cls))
        cls_loss = focal_w * bce
        cls_loss = np.where(targets != -1.0, cls_loss, 0.0)
        cls_losses.append(cls_loss.sum() / max(num_pos, 1.0))

        if num_pos > 0:
            a_pos = assigned[pos]
            gw = np.clip(a_pos[:, 2] - a_pos[:, 0], 1, None)
            gh = np.clip(a_pos[:, 3] - a_pos[:, 1], 1, None)
            gcx = a_pos[:, 0] + 0.5 * (a_pos[:, 2] - a_pos[:, 0])
            gcy = a_pos[:, 1] + 0.5 * (a_pos[:, 3] - a_pos[:, 1])
            t = np.stack(
                [
                    (gcx - acx[pos]) / aw[pos],
                    (gcy - acy[pos]) / ah[pos],
                    np.log(gw / aw[pos]),
                    np.log(gh / ah[pos]),
                ],
                axis=1,
            ) / np.array([0.1, 0.1, 0.2, 0.2])
            diff = np.abs(t - reg[pos])
            rl = np.where(diff <= 1 / 9, 0.5 * 9 * diff ** 2, diff - 0.5 / 9)
            reg_losses.append(rl.mean())
        else:
            reg_losses.append(0.0)

    return float(np.mean(cls_losses)), float(np.mean(reg_losses))


def ref_decode(anchors, deltas, std=(0.1, 0.1, 0.2, 0.2)):
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = (deltas[:, i] * std[i] for i in range(4))
    pcx, pcy = acx + dx * aw, acy + dy * ah
    pw, ph = np.exp(dw) * aw, np.exp(dh) * ah
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=1)
