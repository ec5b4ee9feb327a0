"""Evaluation-layer tests: AP math sanity + corruption suite behavior."""

import dataclasses

import numpy as np
import pytest

from frn_tpu.config import DSEC
from frn_tpu.eval.ap import (
    average_precisions,
    compute_ap,
    compute_overlap,
    evaluate_coco_map,
    evaluate_voc,
    summarize_coco,
)
from frn_tpu.ops.corruption import ALL_CORRUPTIONS, corrupt

RNG = np.random.default_rng(5)


def _boxes(n, w=100, h=100):
    x1 = RNG.uniform(0, w - 20, n)
    y1 = RNG.uniform(0, h - 20, n)
    bw = RNG.uniform(10, 30, n)
    bh = RNG.uniform(10, 30, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], axis=1).astype(np.float64)


def test_compute_ap_perfect():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    assert compute_ap(recall, precision) == 1.0


def test_perfect_detections_ap_one():
    # 4 images, 2 classes; detections == annotations with high scores
    num_classes = 2
    all_det, all_ann = [], []
    for _ in range(4):
        det_img, ann_img = [], []
        for c in range(num_classes):
            b = _boxes(3)
            ann_img.append(b.copy())
            det_img.append(
                np.concatenate([b, RNG.uniform(0.8, 1.0, (3, 1))], axis=1)
            )
        all_det.append(det_img)
        all_ann.append(ann_img)
    aps = evaluate_coco_map(all_det, all_ann, num_classes)
    for c in range(num_classes):
        np.testing.assert_allclose(aps[c], np.ones(10), atol=1e-9)
    s = summarize_coco(aps, ["a", "b"])
    assert s["mAP"] == 1.0 and s["mAP50"] == 1.0


def test_false_positives_reduce_precision():
    b = _boxes(2)
    ann = [[b.copy()]]
    # 2 TPs + 2 far-away FPs with lower scores
    fp = b + 500
    det = np.concatenate(
        [
            np.concatenate([b, np.array([[0.9], [0.85]])], axis=1),
            np.concatenate([fp, np.array([[0.5], [0.4]])], axis=1),
        ]
    )
    aps = evaluate_voc([[det]], ann, 1, iou_threshold=0.5)
    ap, n = aps[0]
    assert n == 2 and ap == 1.0  # FPs after full recall don't hurt VOC AP

    # FP with the HIGHEST score does hurt
    det2 = det.copy()
    det2[2, 4] = 0.99
    det2 = det2[np.argsort(-det2[:, 4])]
    ap2, _ = evaluate_voc([[det2]], ann, 1)[0]
    assert ap2 < 1.0


def test_duplicate_detections_are_fps():
    b = _boxes(1)
    det = np.concatenate([np.tile(b, (3, 1)), np.array([[0.9], [0.8], [0.7]])], axis=1)
    aps = average_precisions([[det]], [[b]], 1, [0.5])
    # 1 TP + 2 duplicate FPs: recall 1 reached at rank 1 with precision 1
    assert aps[0][0] == 1.0


def test_missed_annotations_cap_recall():
    b = _boxes(4)
    det = np.concatenate([b[:2], np.array([[0.9], [0.8]])], axis=1)
    ap, n = evaluate_voc([[det]], [[b]], 1)[0]
    assert n == 4
    assert 0.45 < ap <= 0.5  # recall caps at 0.5 with perfect precision


def test_class_without_annotations_scores_zero():
    det = np.concatenate([_boxes(2), np.array([[0.9], [0.8]])], axis=1)
    aps = evaluate_coco_map([[det, np.zeros((0, 5))]], [[_boxes(2), np.zeros((0, 4))]], 2)
    assert aps[1] == [0.0] * 10


def test_overlap_matches_core():
    a, b = _boxes(5), _boxes(7)
    from tests.reference_impls import ref_iou

    np.testing.assert_allclose(compute_overlap(a, b), ref_iou(a, b), rtol=1e-6)


def test_precision_recall_curve_values():
    """Hand-computed curve: 1 TP (score .9), 1 FP (.8), 1 TP (.7), 1 miss.
    Cumulative precision/recall in score order must match csv_eval.py:240-258
    matching (greedy, per-image argmax, no annotation reuse)."""
    from frn_tpu.eval.ap import precision_recall_curve

    ann = np.array([[10, 10, 30, 30], [50, 50, 80, 80], [200, 200, 240, 240]],
                   np.float64)
    det = np.array(
        [
            [10, 10, 30, 30, 0.9],     # TP
            [300, 300, 320, 320, 0.8], # FP (no overlap)
            [50, 50, 80, 80, 0.7],     # TP
        ]
    )
    recall, precision = precision_recall_curve([[det]], [[ann]], 0)
    np.testing.assert_allclose(recall, [1 / 3, 1 / 3, 2 / 3])
    np.testing.assert_allclose(precision, [1.0, 0.5, 2 / 3])


def test_precision_recall_curve_empty():
    from frn_tpu.eval.ap import precision_recall_curve

    r, p = precision_recall_curve([[np.zeros((0, 5))]], [[np.zeros((0, 4))]], 0)
    assert r.size == 0 and p.size == 0


def test_plot_pr_curves_writes_reference_named_jpgs(tmp_path):
    """csv_eval.py:418-429 artifact surface: one {label_name}_precision_recall.jpg
    per class on save_path."""
    pytest.importorskip("matplotlib")
    from frn_tpu.eval.ap import plot_pr_curves

    b = _boxes(3)
    det = np.concatenate([b, RNG.uniform(0.5, 1.0, (3, 1))], axis=1)
    paths = plot_pr_curves(
        [[det, np.zeros((0, 5))]], [[b, np.zeros((0, 4))]], 2, str(tmp_path),
        label_to_name=lambda i: f"cls{i}",
    )
    import os

    assert [os.path.basename(p) for p in paths] == [
        "cls0_precision_recall.jpg", "cls1_precision_recall.jpg",
    ]
    for p in paths:
        assert os.path.getsize(p) > 0


# ---------------------------------------------------------------- corruption


@pytest.mark.parametrize("name", ALL_CORRUPTIONS)
def test_corruptions_run_and_change_image(name):
    img = RNG.uniform(0, 1, (64, 80, 3)).astype(np.float32)
    out = corrupt(img, name, 3)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()
    assert np.abs(out - img).mean() > 1e-4  # actually did something


def test_corruption_severity_monotone_distortion():
    img = RNG.uniform(0.2, 0.8, (64, 80, 3)).astype(np.float32)
    d1 = np.abs(corrupt(img, "gaussian_noise", 1) - img).mean()
    d5 = np.abs(corrupt(img, "gaussian_noise", 5) - img).mean()
    assert d5 > d1


def test_corruption_deterministic():
    img = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    a = corrupt(img, "impulse_noise", 2)
    b = corrupt(img, "impulse_noise", 2)
    np.testing.assert_array_equal(a, b)


def test_corruption_sweep_smoke(tmp_path):
    """End-to-end sweep driver over a tiny fixture with a tiny model."""
    import dataclasses

    import jax

    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.data.csv_dataset import CSVDetectionDataset
    from frn_tpu.data.synthetic import make_csv_fixture
    from frn_tpu.eval import corruption_sweep, make_inference_fn
    from frn_tpu.models.detector import init_detector

    tiny = dataclasses.replace(DSEC, height=48, width=64)
    fix = make_csv_fixture(str(tmp_path), geometry=tiny, num_images=3, seed=9)
    ds = CSVDetectionDataset(
        tiny, fix["annotations_csv"], fix["class_map_csv"],
        fix["event_dir"], fix["img_dir"],
    )
    cfg = FrameworkConfig(
        geometry=tiny,
        model=ModelConfig(variant="rgb", depth=18, num_classes=3, feature_size=16),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(model, variables, cfg)
    res = corruption_sweep(
        ds, infer, cfg, corruptions=["gaussian_noise"], severities=(1, 3),
        batch_size=2,
    )
    assert set(res) == {"gaussian_noise"}
    assert set(res["gaussian_noise"]) == {1, 3}
    assert all(len(v) == 3 for v in res["gaussian_noise"].values())


def test_corruption_folder_mode(tmp_path):
    """Pre-generated corruption folders as eval input (reference protocol,
    test_dsec.py:133-139: root_img swapped per (type, severity))."""
    import dataclasses
    import shutil

    import jax
    import pytest

    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.data.csv_dataset import CSVDetectionDataset
    from frn_tpu.data.synthetic import make_csv_fixture
    from frn_tpu.eval import corruption_sweep, make_inference_fn
    from frn_tpu.eval.evaluator import corrupted_folder_dataset
    from frn_tpu.models.detector import init_detector

    tiny = dataclasses.replace(DSEC, height=48, width=64)
    fix = make_csv_fixture(str(tmp_path / "clean"), geometry=tiny, num_images=2, seed=3)
    ds = CSVDetectionDataset(
        tiny, fix["annotations_csv"], fix["class_map_csv"],
        fix["event_dir"], fix["img_dir"],
    )
    # corrupted tree = copy of the image tree under <root>/<type>/severity_<s>
    corrupt_root = tmp_path / "corruptions"
    shutil.copytree(fix["img_dir"], corrupt_root / "gaussian_noise" / "severity_2")

    cfg = FrameworkConfig(
        geometry=tiny,
        model=ModelConfig(variant="rgb", depth=18, num_classes=3, feature_size=16),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(model, variables, cfg)
    res = corruption_sweep(
        ds, infer, cfg, corruptions=["gaussian_noise"], severities=(2,),
        batch_size=2, corruption_root=str(corrupt_root),
    )
    assert set(res["gaussian_noise"]) == {2}

    with pytest.raises(FileNotFoundError):
        corrupted_folder_dataset(ds, str(corrupt_root), "fog", 1)
