"""End-to-end integration: synthetic fixture -> Trainer -> checkpoint -> eval -> viz."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig, TrainConfig
from frn_tpu.data.csv_dataset import CSVDetectionDataset
from frn_tpu.data.synthetic import make_csv_fixture, make_dsec_det_fixture

TINY = dataclasses.replace(DSEC, height=48, width=64)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("csv_fix")
    paths = make_csv_fixture(str(root), geometry=TINY, num_images=6, seed=1)
    ds = CSVDetectionDataset(
        TINY, paths["annotations_csv"], paths["class_map_csv"],
        paths["event_dir"], paths["img_dir"],
    )
    return paths, ds


def _config():
    return FrameworkConfig(
        geometry=TINY,
        model=ModelConfig(
            variant="fusion", depth=18, num_classes=3, feature_size=16,
            attention_chunk=128,
        ),
        train=TrainConfig(
            batch_size=2, learning_rate=1e-4, accum_steps=1, epochs=2,
            max_annots_per_image=8, checkpoint_every=1,
        ),
    )


def test_full_stack(fixture, tmp_path):
    paths, ds = fixture
    cfg = _config()

    from frn_tpu.eval import evaluate_dataset
    from frn_tpu.models.detector import decode_detections
    from frn_tpu.train.trainer import Trainer

    ckpt_dir = str(tmp_path / "ckpt")
    trainer = Trainer(cfg, ds, checkpoint_dir=ckpt_dir, log_every=0, use_mesh=False)
    history = trainer.fit(2)
    assert len(history) == 2
    assert all(np.isfinite(h) for h in history)
    assert history[1] <= history[0] * 3.0  # not exploding

    # checkpoint resume restores epoch counter
    trainer2 = Trainer(cfg, ds, checkpoint_dir=ckpt_dir, log_every=0, use_mesh=False)
    assert trainer2.resume()
    assert trainer2.epoch == 2

    # eval path over the train set
    model, state = trainer.model, trainer.state
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    from frn_tpu.models.detector import eval_output_for

    @jax.jit
    def infer(rgb, event):
        cls, reg = model.apply(variables, rgb, event, train=False,
                               eval_output=eval_output_for(cfg))
        return decode_detections(cls, reg, cfg)

    res = evaluate_dataset(ds, infer, cfg, batch_size=2)
    assert set(res.summary) >= {"mAP", "mAP50", "mAP75"}
    assert 0.0 <= res.summary["mAP"] <= 1.0
    assert res.fps > 0

    # visualization panel
    from frn_tpu.utils.visualization import save_detection_panel

    s = ds[0]
    scores, labels, boxes = infer(s["rgb"][None], s["event"][None])
    out_png = str(tmp_path / "panel.png")
    save_detection_panel(
        out_png, ds.load_rgb(0), s["event"],
        np.asarray(boxes[0]), np.asarray(labels[0]), np.asarray(scores[0]),
        class_names=list(TINY.class_names), score_threshold=0.0,
    )
    assert os.path.exists(out_png) and os.path.getsize(out_png) > 0


def test_dsec_det_debug_cli(tmp_path, capsys):
    root = tmp_path / "raw"
    make_dsec_det_fixture(str(root), num_sequences=1, frames_per_sequence=4)
    from frn_tpu.cli.train_dsec_det_fast import main

    main(["--dataset_root", str(root), "--debug_data", "--batch_size", "2"])
    out = capsys.readouterr().out
    assert "batch 0" in out and "valid annots" in out


def test_corrupted_dataset_wrapper(fixture):
    _, ds = fixture
    from frn_tpu.eval import CorruptedDataset

    cd = CorruptedDataset(ds, "gaussian_noise", 3)
    s_clean = ds[0]
    s_corr = cd[0]
    assert s_corr["rgb"].shape == s_clean["rgb"].shape
    assert np.abs(s_corr["rgb"] - s_clean["rgb"]).mean() > 1e-3
    np.testing.assert_array_equal(s_corr["event"], s_clean["event"])  # events untouched
    np.testing.assert_array_equal(s_corr["annot"], s_clean["annot"])
