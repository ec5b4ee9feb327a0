"""Hand-computed cases for the native COCOeval-protocol evaluator
(frn_tpu/eval/coco_protocol.py vs pycocotools semantics, coco_eval.py:6-84)."""

import numpy as np
import pytest

from frn_tpu.eval.coco_protocol import (
    AREA_RNG,
    IOU_THRS,
    MAX_DETS,
    _evaluate_img,
    _iou_xyxy,
    evaluate_coco_protocol,
)


def det(x1, y1, x2, y2, s):
    return np.array([[x1, y1, x2, y2, s]], np.float64)


def box(x1, y1, x2, y2):
    return np.array([[x1, y1, x2, y2]], np.float64)


def test_iou_crowd_denominator():
    d = np.array([[0, 0, 10, 10]], np.float64)
    g = np.array([[0, 0, 20, 20]], np.float64)
    plain = _iou_xyxy(d, g, np.array([False]))
    crowd = _iou_xyxy(d, g, np.array([True]))
    assert plain[0, 0] == pytest.approx(100 / 400)
    assert crowd[0, 0] == pytest.approx(1.0)  # inter / dt area


def test_single_match_iou_060():
    # dt vs gt with IoU exactly 0.6: thresholds 0.50/0.55/0.60 match -> AP 1 at
    # 3 of 10 thresholds -> mAP 0.3; AP50 = 1.0
    gt = box(0, 0, 10, 10)
    dt = det(0, 0, 10, 6, 0.9)  # inter 60, union 100 -> 0.6
    res = evaluate_coco_protocol([[dt]], [[gt]])
    assert res.stats["AP50"] == pytest.approx(1.0)
    assert res.stats["AP"] == pytest.approx(0.3)
    assert res.stats["AR100"] == pytest.approx(0.3)


def test_duplicate_detection_is_fp_at_lower_score():
    # second dt on the same gt: unmatched -> FP after the TP; envelope keeps
    # precision 1.0 up to recall 1.0 -> AP unchanged, but a higher-scoring dup
    # (TP second) caps precision at the first recall point
    gt = box(0, 0, 10, 10)
    dts = np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8]], np.float64)
    res = evaluate_coco_protocol([[dts]], [[gt]])
    assert res.stats["AP50"] == pytest.approx(1.0)

    # now the duplicate scores HIGHER than the true match on a second gt:
    # order: dup(0.95) matches gt1, tp(0.9) -> unmatched -> fp, gt2 never found
    gts = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float64)
    dts = np.array(
        [[0, 0, 10, 10, 0.95], [0, 0, 10, 10, 0.9]], np.float64
    )
    res = evaluate_coco_protocol([[dts]], [[gts]])
    # rc=[0.5, 0.5], pr=[1, 0.5] -> precision 1.0 for recThrs <= 0.5, 0 above
    # -> AP50 = 51/101
    assert res.stats["AP50"] == pytest.approx(51 / 101)


def test_max_dets_truncation():
    # 11 gts, 11 perfect dts: AR@10 truncates to 10/11, AR@100 sees all
    gts = np.array([[10 * i, 0, 10 * i + 8, 8] for i in range(11)], np.float64)
    dts = np.array(
        [[10 * i, 0, 10 * i + 8, 8, 0.5 + 0.01 * i] for i in range(11)], np.float64
    )
    res = evaluate_coco_protocol([[dts]], [[gts]])
    assert res.stats["AR100"] == pytest.approx(1.0)
    assert res.stats["AR10"] == pytest.approx(10 / 11)
    assert res.stats["AR1"] == pytest.approx(1 / 11)


def test_area_ranges_partition():
    # one small (8x8=64 < 32^2) and one large (200x200 > 96^2) gt, both matched
    gt_s = box(0, 0, 8, 8)
    gt_l = box(100, 100, 300, 300)
    gts = np.concatenate([gt_s, gt_l])
    dts = np.array([[0, 0, 8, 8, 0.9], [100, 100, 300, 300, 0.8]], np.float64)
    res = evaluate_coco_protocol([[dts]], [[gts]])
    assert res.stats["AP"] == pytest.approx(1.0)
    assert res.stats["APs"] == pytest.approx(1.0)
    assert res.stats["APl"] == pytest.approx(1.0)
    assert res.stats["APm"] == -1.0  # no medium gt -> excluded


def test_detection_outside_area_range_not_fp():
    # a large unmatched detection must not count as FP in the 'small' range
    gt = box(0, 0, 8, 8)
    dts = np.array(
        [[0, 0, 8, 8, 0.9], [100, 100, 300, 300, 0.95]], np.float64
    )
    res = evaluate_coco_protocol([[dts]], [[gt]])
    assert res.stats["APs"] == pytest.approx(1.0)
    # in 'all', the big detection IS a higher-scored FP: pr=[0, 0.5]
    assert res.stats["AP"] < 1.0


def test_crowd_gt_absorbs_extra_dts_without_fp():
    # crowd region: both dts overlap it; neither should become FP, and the
    # crowd gt itself is ignored (not counted as gt)
    gt_valid = box(0, 0, 10, 10)
    gt_crowd = box(50, 50, 100, 100)
    gts = np.concatenate([gt_valid, gt_crowd])
    crowd = np.array([False, True])
    dts = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [55, 55, 70, 70, 0.8],  # inside crowd -> matched-to-ignored
            [60, 60, 80, 80, 0.7],  # crowd can absorb many
        ],
        np.float64,
    )
    res = evaluate_coco_protocol([[dts]], [[gts]], crowd=[[crowd]])
    assert res.stats["AP50"] == pytest.approx(1.0)


def test_ignored_gt_preference():
    # a dt overlapping both a valid gt (IoU .55) and an ignored/crowd gt
    # (IoU .9) must match the VALID one at t=0.5 (valid-first ordering)
    gt_valid = box(0, 0, 10, 10)
    gt_crowd = box(0, 0, 10, 12)
    gts = np.concatenate([gt_valid, gt_crowd])
    crowd = np.array([False, True])
    dt_boxes = np.array([[0, 0, 10, 11]], np.float64)
    cell = _evaluate_img(
        dt_boxes, np.array([0.9]), gts, crowd, AREA_RNG["all"], 100
    )
    assert cell["dtMatches"][0, 0] == 1  # matched gt index 0 (valid), 1-based
    assert not cell["dtIgnore"][0, 0]


def test_empty_class_excluded():
    gt = box(0, 0, 10, 10)
    dt = det(0, 0, 10, 10, 0.9)
    empty_d = np.zeros((0, 5))
    empty_g = np.zeros((0, 4))
    res = evaluate_coco_protocol([[dt, empty_d]], [[gt, empty_g]], num_classes=2)
    assert res.stats["AP"] == pytest.approx(1.0)  # class 2 has no gt -> excluded


def test_multi_image_global_score_ranking():
    # img0: TP @0.6; img1: FP @0.8 — global sort puts the FP first:
    # pr=[0, 0.5] at rc=[0, 1.0] -> envelope 0.5 everywhere -> AP50 = 0.5
    gt0 = box(0, 0, 10, 10)
    dt0 = det(0, 0, 10, 10, 0.6)
    dt1 = det(50, 50, 60, 60, 0.8)
    res = evaluate_coco_protocol(
        [[dt0], [dt1]], [[gt0], [np.zeros((0, 4))]]
    )
    assert res.stats["AP50"] == pytest.approx(0.5)


def test_summary_lines_shape():
    gt = box(0, 0, 10, 10)
    dt = det(0, 0, 10, 10, 0.9)
    res = evaluate_coco_protocol([[dt]], [[gt]])
    lines = res.summary_lines()
    assert len(lines) == 12
    assert "0.50:0.95" in lines[0]
