"""CLI smoke tests: drive train -> test -> visualize mains at a tiny geometry."""

import dataclasses
import json
import os

import numpy as np
import pytest

from frn_tpu.config import DSEC
from frn_tpu.data.synthetic import make_csv_fixture

TINY = dataclasses.replace(DSEC, height=64, width=64)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_fix")
    return make_csv_fixture(str(root), geometry=TINY, num_images=4, seed=2)


def _common_flags(fix):
    return [
        "--dataset_name", "dsec",
        "--csv_classes", fix["class_map_csv"],
        "--root_img", fix["img_dir"],
        "--root_event", fix["event_dir"],
        "--image_height", "64", "--image_width", "64",
        "--fusion", "rgb", "--depth", "18", "--feature_size", "16",
    ]


def test_cli_train_test_visualize(fixture, tmp_path, capsys):
    from frn_tpu.cli.train import main as train_main

    ckpt = str(tmp_path / "ckpt")
    train_main(
        _common_flags(fixture)
        + ["--csv_train", fixture["annotations_csv"], "--epochs", "1",
           "--batch_size", "2", "--checkpoint_dir", ckpt, "--augment"]
    )
    out = capsys.readouterr().out
    assert "epoch 1/1" in out
    assert os.path.isdir(ckpt)

    from frn_tpu.cli.test import main as test_main

    test_main(
        _common_flags(fixture)
        + ["--csv_test", fixture["annotations_csv"], "--checkpoint", ckpt,
           "--batch_size", "2",
           "--save_detect_folder", str(tmp_path / "eval"),
           "--pr_curve_path", str(tmp_path / "pr")]
    )
    out = capsys.readouterr().out
    assert '"mAP"' in out and "fps" in out
    assert os.path.exists(tmp_path / "eval" / "detections.txt")
    # per-class PR jpgs with the reference's names (csv_eval.py:418-429)
    prs = sorted(os.listdir(tmp_path / "pr"))
    assert prs and all(p.endswith("_precision_recall.jpg") for p in prs)

    from frn_tpu.cli.visualize import main as viz_main

    viz_main(
        _common_flags(fixture)
        + ["--csv_test", fixture["annotations_csv"], "--checkpoint", ckpt,
           "--output_dir", str(tmp_path / "viz"), "--max_images", "1",
           "--score_threshold", "0.0"]
    )
    assert os.path.exists(tmp_path / "viz" / "000000.png")


def test_corruption_artifact_layout(tmp_path):
    """The corruption sweep must emit the reference's per-corruption artifacts:
    {corruption}_ap.txt pickles keyed by class name -> per-severity AP list
    (test_dsec.py:176-178), alongside the combined corruption_aps.pkl."""
    import pickle

    from frn_tpu.cli.test import write_corruption_artifacts

    results = {
        "gaussian_noise": {1: [0.5, 0.4], 3: [0.3, 0.2]},
        "fog": {1: [0.6, 0.1], 3: [0.55, 0.05]},
    }
    write_corruption_artifacts(results, ["car", "person"], str(tmp_path))
    for corruption in results:
        with open(tmp_path / f"{corruption}_ap.txt", "rb") as f:
            per_class = pickle.load(f)
        assert per_class["car"] == [results[corruption][1][0], results[corruption][3][0]]
        assert per_class["person"] == [results[corruption][1][1], results[corruption][3][1]]
    with open(tmp_path / "corruption_aps.pkl", "rb") as f:
        assert pickle.load(f) == results


def test_cli_gray_event_type(fixture, tmp_path):
    # gray e2vid channel: 1-channel event stem; fabricate gray pngs next to npz
    import cv2

    rng = np.random.default_rng(0)
    for dirpath, _, files in os.walk(fixture["event_dir"]):
        for f in files:
            if f.endswith(".npz"):
                png = os.path.join(dirpath, f.replace(".npz", ".png"))
                cv2.imwrite(png, rng.integers(0, 255, (64, 64), np.uint8))

    from frn_tpu.cli.train import main as train_main

    train_main(
        _common_flags(fixture)
        + ["--csv_train", fixture["annotations_csv"], "--epochs", "1",
           "--batch_size", "2", "--event_type", "gray",
           "--checkpoint_dir", str(tmp_path / "ckpt_gray"),
           "--fusion", "event"]
    )
    assert os.path.isdir(tmp_path / "ckpt_gray")


@pytest.mark.parametrize(
    "module_name, expected",
    [
        ("train_dsec", {"dataset_name": "dsec"}),
        ("train_ddd17", {"dataset_name": "ddd17", "batch_size": 4,
                         "epochs": 200, "checkpoint_every": 10}),
        ("test_dsec", {"dataset_name": "dsec"}),
        ("test_ddd17", {"dataset_name": "ddd17"}),
    ],
)
def test_cli_alias_main_injects_defaults(monkeypatch, module_name, expected):
    """Alias main() must apply the alias defaults (reference train_dsec.py:38-52
    / test_ddd17.py hardcode them), with explicit user args overriding."""
    import importlib

    mod = importlib.import_module(f"frn_tpu.cli.{module_name}")
    captured = {}
    required = ["--csv_classes", "c.csv", "--root_img", "i", "--root_event", "e"]
    required += (["--csv_train", "t.csv"] if module_name.startswith("train")
                 else ["--checkpoint", "ck"])

    def fake_main(argv=None):
        captured["args"] = mod.get_parser().parse_args(argv)

    monkeypatch.setattr(mod, "_main", fake_main)
    mod.main(required)
    for key, val in expected.items():
        assert getattr(captured["args"], key) == val, key

    # explicit user args win over alias defaults (argparse last-occurrence)
    override = "ddd17" if expected["dataset_name"] == "dsec" else "dsec"
    mod.main(required + ["--dataset_name", override])
    assert captured["args"].dataset_name == override
