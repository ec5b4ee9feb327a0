"""Quantify NMS mode deltas: exact vs approx candidate pool vs the loop oracle.

VERDICT item: adversarial cases (score ties, IoU exactly at the 0.5 threshold,
>400 candidates per class) + an mAP-level A/B so the approx_max_k default's
effect is a measured number (recorded in PARITY.md), not an assumption.

Semantics notes being pinned here:
  * torchvision.ops.nms suppresses at IoU strictly > threshold; boxes at exactly
    0.5 are kept (model.py:350 uses nms(..., 0.5)).
  * the reference NMS has no candidate pool: it processes every anchor above the
    score threshold. class_aware_nms pools top-`per_class_topk` (400) first; the
    pool only matters if NMS would suppress enough of the top 400 that pool-
    truncated boxes could reach the global top-100.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from frn_tpu.core.nms import class_aware_nms, greedy_nms_mask  # noqa: E402
from tests.reference_impls import ref_nms  # noqa: E402


def _nms_sets(scores, labels, boxes):
    out = []
    scores, labels, boxes = map(np.asarray, (scores, labels, boxes))
    for s, l, b in zip(scores, labels, boxes):
        if s > 0:
            out.append((int(l), round(float(s), 6), tuple(np.round(b, 3))))
    return sorted(out)


def _oracle_class_nms(boxes, scores, score_thr, iou_thr, max_det):
    """Reference eval-branch semantics (model.py:340-364 + top-100)."""
    all_s, all_l, all_b = [], [], []
    for c in range(scores.shape[1]):
        s = scores[:, c]
        m = s > score_thr
        if not m.any():
            continue
        keep = ref_nms(boxes[m], s[m], iou_thr)
        all_s.extend(s[m][keep])
        all_l.extend([c] * len(keep))
        all_b.extend(boxes[m][keep])
    order = np.argsort(-np.asarray(all_s), kind="stable")[:max_det]
    return (
        np.asarray(all_s, np.float32)[order],
        np.asarray(all_l, np.int64)[order],
        np.asarray(all_b, np.float32)[order],
    )


def test_fixpoint_equals_oracle_on_score_ties():
    # 60 boxes in 3 clusters; many exact score ties -> ordering must follow the
    # (stable) descending sort exactly like torchvision's
    rng = np.random.default_rng(0)
    centers = np.array([[50, 50], [52, 52], [200, 200]])
    boxes, scores = [], []
    for cx, cy in centers:
        for i in range(20):
            dx, dy = rng.uniform(-4, 4, 2)
            w, h = rng.uniform(18, 24, 2)
            boxes.append([cx + dx - w / 2, cy + dy - h / 2, cx + dx + w / 2, cy + dy + h / 2])
            scores.append(0.5 if i % 3 else 0.9)  # heavy ties
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)

    order = np.argsort(-scores, kind="stable")
    keep_mask = np.asarray(greedy_nms_mask(jnp.asarray(boxes[order]), jnp.asarray(scores[order]), 0.5))
    ours = set(order[np.where(keep_mask)[0]].tolist())
    oracle = set(ref_nms(boxes, scores, 0.5).tolist())
    assert ours == oracle


def test_iou_exactly_at_threshold_is_kept():
    # IoU(b0, b1) == 0.5 exactly: strict > comparison keeps b1
    # inter = 100, union = 100 + 200 - 100 = 200 -> iou = 0.5 exactly
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 20]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    keep = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.tolist() == [True, True]
    assert ref_nms(boxes, scores, 0.5).tolist() == [0, 1]
    # just above the threshold: suppressed
    boxes2 = np.array([[0, 0, 10, 10], [0, 0, 10, 19.5]], np.float32)
    keep2 = np.asarray(greedy_nms_mask(jnp.asarray(boxes2), jnp.asarray(scores), 0.5))
    assert keep2.tolist() == [True, False]


@pytest.mark.parametrize("approx", [False, True])
def test_class_aware_nms_vs_oracle_dense_candidates(approx):
    # 1200 candidates per class (3x the 400 pool), realistic score decay; the
    # exact-pool mode must match the full oracle on the surfaced top-100, and
    # the approx mode's delta is measured below
    rng = np.random.default_rng(1)
    A, K = 3000, 3
    boxes = np.zeros((A, 4), np.float32)
    cx = rng.uniform(0, 600, A)
    cy = rng.uniform(0, 440, A)
    w = rng.uniform(10, 60, A)
    h = rng.uniform(10, 60, A)
    boxes[:, 0], boxes[:, 1] = cx - w / 2, cy - h / 2
    boxes[:, 2], boxes[:, 3] = cx + w / 2, cy + h / 2
    scores = rng.beta(1, 12, (A, K)).astype(np.float32)  # ~8% above 0.05

    ours = class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), approx_topk=approx
    )
    oracle = _oracle_class_nms(boxes, scores, 0.05, 0.5, 100)
    ours_set = _nms_sets(*[np.asarray(o) for o in ours])
    oracle_set = _nms_sets(*oracle)
    if not approx:
        assert ours_set == oracle_set
    else:
        # approx_max_k may swap tail-pool entries; quantify the surfaced delta
        inter = len(set(ours_set) & set(oracle_set))
        assert inter >= 0.99 * len(oracle_set), (
            f"approx pool surfaced delta too large: {inter}/{len(oracle_set)}"
        )


def test_map_delta_exact_vs_approx_pool():
    """mAP-level A/B of the candidate-pool mode on a synthetic detection task.

    The measured delta (0.0 at this scale) is recorded in PARITY.md; record
    runs default to exact (cli/test.py), the bench reports both.
    """
    from frn_tpu.eval.ap import evaluate_coco_map

    rng = np.random.default_rng(2)
    K, IMGS, A = 3, 8, 2000
    all_dets = {False: [], True: []}
    all_annots = []
    for _ in range(IMGS):
        gt = []
        for c in range(K):
            for _ in range(4):
                x, y = rng.uniform(0, 560), rng.uniform(0, 400)
                w, h = rng.uniform(20, 70, 2)
                gt.append([x, y, x + w, y + h, c])
        gt = np.asarray(gt, np.float32)
        all_annots.append([gt[gt[:, 4] == c, :4] for c in range(K)])

        # noisy detections around gt + uniform background clutter
        boxes = np.zeros((A, 4), np.float32)
        scores = np.zeros((A, K), np.float32)
        i = 0
        for row in gt:
            for _ in range(40):
                jx, jy = rng.normal(0, 6, 2)
                jw, jh = rng.normal(1, 0.12, 2)
                bw, bh = (row[2] - row[0]) * jw, (row[3] - row[1]) * jh
                boxes[i] = [row[0] + jx, row[1] + jy, row[0] + jx + bw, row[1] + jy + bh]
                scores[i, int(row[4])] = np.clip(rng.beta(4, 3), 0, 1)
                i += 1
        while i < A:
            x, y = rng.uniform(0, 560), rng.uniform(0, 400)
            w, h = rng.uniform(10, 80, 2)
            boxes[i] = [x, y, x + w, y + h]
            scores[i, rng.integers(K)] = rng.beta(1, 20)
            i += 1

        for approx in (False, True):
            s, l, b = [np.asarray(o) for o in class_aware_nms(
                jnp.asarray(boxes), jnp.asarray(scores), approx_topk=approx
            )]
            keep = s > 0
            dets = np.concatenate([b[keep], s[keep, None]], axis=1)
            all_dets[approx].append([dets[l[keep] == c] for c in range(K)])

    maps = {}
    for approx in (False, True):
        aps = evaluate_coco_map(all_dets[approx], all_annots, K)
        maps[approx] = float(np.mean([np.mean(v) for v in aps.values()]))
    delta = abs(maps[True] - maps[False])
    print(f"mAP exact={maps[False]:.6f} approx={maps[True]:.6f} delta={delta:.6f}")
    assert delta < 2e-3, f"approx pool moved mAP by {delta}"
