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


def test_shape_mismatch_raises():
    template = _template("rgb")
    sd = _fake_torch_sd(template, "rgb")
    k = next(iter(sd))
    sd[k] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises((ValueError, KeyError)):
        convert_state_dict(sd, template, variant="rgb", strict=True)
