"""Checkpoint-converter tests: bidirectional coverage of the torch name mapping."""

import dataclasses

import numpy as np
import pytest

import jax

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
from frn_tpu.convert.torch_import import (
    _flatten,
    convert_state_dict,
    torch_key_for,
)
from frn_tpu.models.detector import init_detector

TINY = dataclasses.replace(DSEC, height=32, width=32)


def _template(variant, depth=18):
    cfg = FrameworkConfig(
        geometry=TINY,
        model=ModelConfig(variant=variant, depth=depth, num_classes=3, feature_size=16,
                          attention_chunk=64),
    )
    _, variables = init_detector(cfg, jax.random.PRNGKey(0))
    return {k: variables[k] for k in ("params", "batch_stats")}


def _fake_torch_sd(template, variant):
    """Inverse mapping: build a torch state_dict with random values."""
    rng = np.random.default_rng(0)
    sd = {}
    for collection in ("params", "batch_stats"):
        for path, leaf in _flatten(template[collection]).items():
            key = torch_key_for(path, collection, variant)
            shape = np.shape(leaf)
            if path[-1] == "kernel":
                kh, kw, cin, cout = shape
                arr = rng.normal(size=(cout, cin, kh, kw))
            else:
                arr = rng.normal(size=shape)
            sd[key] = arr.astype(np.float32)
    return sd


@pytest.mark.parametrize("variant", ["fusion", "rgb", "event"])
def test_roundtrip_conversion(variant):
    template = _template(variant)
    sd = _fake_torch_sd(template, variant)
    out = convert_state_dict(sd, template, variant=variant, strict=True)
    assert out["_unused_torch_keys"] == []

    # every leaf came through with the right value (incl. conv transpose)
    for path, leaf in _flatten(out["params"]).items():
        key = torch_key_for(path, "params", variant)
        src = sd[key]
        if path[-1] == "kernel":
            src = np.transpose(src, (2, 3, 1, 0))
        np.testing.assert_array_equal(np.asarray(leaf), src)


def test_expected_torch_names_fusion():
    # depth 50: bottleneck blocks, so layer1.0 has a projection downsample
    template = _template("fusion", depth=50)
    keys = {
        torch_key_for(p, "params", "fusion")
        for p in _flatten(template["params"])
    }
    # spot-check the reference's module names (retinanet/model.py)
    expected = {
        "conv1.weight", "bn1.weight", "bn1.bias",
        "conv1_event.weight", "bn1_event.weight",
        "layer1.0.conv1.weight", "layer1.0.downsample.0.weight",
        "layer2_event.0.conv1.weight",
        "fus.0.conv0_rgb.weight", "fus.0.conv0_rgb.bias",
        "fus.3.rgb_cross_attention.g.weight", "fus.3.event_cross_attention.W.bias",
        "fpn.P5_1.weight", "fpn.P2_2.bias", "fpn.P6.weight",
        "regressionModel.conv1.weight", "regressionModel.output.bias",
        "classificationModel.conv4.bias", "classificationModel.output.weight",
    }
    missing = expected - keys
    assert not missing, missing


def test_released_checkpoint_recipe_end_to_end(tmp_path):
    """The PARITY.md released-weights recipe, on a synthetic torch .pt.

    Mirrors exactly what a user does the moment the Google-Drive weights are
    reachable: (1) a reference-schema checkpoint file ({'model_state_dict',
    'epoch'} wrapper with DataParallel 'module.' prefixes — train_dsec.py's
    save schema), (2) `cli/test.py --checkpoint best.pt` loads it via
    load_checkpoint_into_state, and (3) `cli/convert_checkpoint.py` writes an
    orbax dir that restores bit-identically.
    """
    import torch

    from frn_tpu.cli.common import load_checkpoint_into_state
    from frn_tpu.train.checkpoint import CheckpointManager
    from frn_tpu.train.loop import create_train_state

    cfg = FrameworkConfig(
        geometry=TINY,
        model=ModelConfig(variant="fusion", depth=18, num_classes=3,
                          feature_size=16, attention_chunk=64),
    )
    _, state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch_size=1)
    template = {"params": state.params, "batch_stats": state.batch_stats}
    sd = _fake_torch_sd(template, "fusion")

    # reference trainer save schema + DataParallel prefix
    pt = tmp_path / "best.pt"
    torch.save(
        {
            "epoch": 7,
            "model_state_dict": {
                "module." + k: torch.from_numpy(v) for k, v in sd.items()
            },
        },
        pt,
    )

    class Args:
        checkpoint = str(pt)

    loaded, _ = load_checkpoint_into_state(Args(), cfg, state)
    want = convert_state_dict(sd, template, variant="fusion", strict=True)
    for path, leaf in _flatten(loaded.params).items():
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(_flatten(want["params"])[path])
        )

    # orbax leg: save the converted state, restore into a FRESH random state
    mgr = CheckpointManager(str(tmp_path / "orbax"))
    mgr.save(epoch=0, state=jax.device_get(loaded), meta={"source": str(pt)})
    mgr.close()
    _, fresh, _ = create_train_state(cfg, jax.random.PRNGKey(1), batch_size=1)

    class Args2:
        checkpoint = str(tmp_path / "orbax")

    restored, meta = load_checkpoint_into_state(Args2(), cfg, fresh)
    assert meta.get("source") == str(pt)
    for path, leaf in _flatten(restored.params).items():
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(_flatten(loaded.params)[path])
        )


def test_shape_mismatch_raises():
    template = _template("rgb")
    sd = _fake_torch_sd(template, "rgb")
    k = next(iter(sd))
    sd[k] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises((ValueError, KeyError)):
        convert_state_dict(sd, template, variant="rgb", strict=True)
