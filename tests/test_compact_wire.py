"""Compact host->device wire format for the eval input pipeline.

The streaming-eval bottleneck on hosted TPUs is the input link, not compute
(measured for the identical serving path in tools/bench_serve.py: 15.3 rps
compact vs 3.59 f32). `DSECDetDataset(compact_wire=True)` emits uint8 RGB +
int8 raw-count voxels, `collate_fixed` preserves the dtypes, and
`make_inference_fn(wire='compact')` fuses /255, standardization, and the
conditional tanh squash (dsec_data.py:461-462) into the jitted program.

These tests pin the exactness argument: the compact pipeline's detections
match the host-normalized f32 pipeline's bit-for-bit up to tanh ulp noise.
"""

import dataclasses

import jax
import numpy as np
import pytest

from frn_tpu.config import DSEC_DET, FrameworkConfig, ModelConfig
from frn_tpu.data.collate import collate_fixed
from frn_tpu.data.dsec_det import DSECDetDataset
from frn_tpu.data.synthetic import make_dsec_det_fixture

TINY = dataclasses.replace(DSEC_DET, height=96, width=128)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec_det_compact")
    make_dsec_det_fixture(
        str(root), num_sequences=1, frames_per_sequence=6, geometry=TINY
    )
    return str(root)


def test_compact_wire_rejects_non_voxel(fixture_root):
    with pytest.raises(ValueError, match="voxel"):
        DSECDetDataset(
            fixture_root, geometry=TINY,
            event_representation="time_surface", compact_wire=True,
        )


def test_compact_samples_match_f32_after_normalization(fixture_root):
    ds_f32 = DSECDetDataset(fixture_root, geometry=TINY, time_window_us=100_000)
    ds_u8 = DSECDetDataset(
        fixture_root, geometry=TINY, time_window_us=100_000, compact_wire=True
    )
    assert len(ds_f32) == len(ds_u8) > 0
    for i in range(len(ds_u8)):
        a, b = ds_f32[i], ds_u8[i]
        assert b["rgb"].dtype == np.uint8
        assert b["event"].dtype == np.int8
        # u8/255 is the exact arithmetic the f32 path ran on the host
        np.testing.assert_array_equal(a["rgb"], b["rgb"].astype(np.float32) / 255.0)
        # conditional per-sample tanh squash of the int8 counts == host normalize
        v = b["event"].astype(np.float32)
        if np.abs(v).max() > 5.0:
            v = np.tanh(v / 5.0)
        np.testing.assert_allclose(a["event"], v, atol=1e-6)
        np.testing.assert_array_equal(a["annot"], b["annot"])


def test_collate_preserves_compact_dtypes(fixture_root):
    ds = DSECDetDataset(fixture_root, geometry=TINY, compact_wire=True)
    batch = collate_fixed([ds[0], ds[1]], TINY, max_annots=8, batch_size=4)
    assert batch["rgb"].dtype == np.uint8
    assert batch["event"].dtype == np.int8
    assert batch["rgb"].shape == (4, TINY.height, TINY.width, 3)
    assert batch["event"].shape == (4, TINY.height, TINY.width, TINY.event_channels)


def test_batched_squash_is_per_sample():
    from frn_tpu.ops.voxelize import normalize_event_voxel_batched, normalize_event_voxel_np

    rng = np.random.default_rng(0)
    quiet = rng.integers(-3, 4, (1, 8, 8, 2)).astype(np.float32)  # max <= 5
    busy = rng.integers(-90, 90, (1, 8, 8, 2)).astype(np.float32)
    batch = np.concatenate([quiet, busy], axis=0)
    out = np.asarray(normalize_event_voxel_batched(batch))
    # one busy sample must not squash its quiet batchmate
    np.testing.assert_allclose(out[0], normalize_event_voxel_np(quiet[0]), atol=1e-6)
    np.testing.assert_allclose(out[1], normalize_event_voxel_np(busy[0]), atol=1e-6)


def test_compact_eval_detections_match_f32(fixture_root):
    """End-to-end: identical detections from the f32 and compact pipelines."""
    from frn_tpu.eval.detections import make_inference_fn
    from frn_tpu.models.detector import init_detector

    cfg = FrameworkConfig(
        geometry=TINY,
        model=ModelConfig(
            variant="fusion", depth=18, num_classes=2, feature_size=32,
            attention_chunk=128,
        ),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))

    ds_f32 = DSECDetDataset(fixture_root, geometry=TINY, time_window_us=100_000)
    ds_u8 = DSECDetDataset(
        fixture_root, geometry=TINY, time_window_us=100_000, compact_wire=True
    )
    n = min(4, len(ds_f32))
    batch_f32 = collate_fixed([ds_f32[i] for i in range(n)], TINY, batch_size=4)
    batch_u8 = collate_fixed([ds_u8[i] for i in range(n)], TINY, batch_size=4)

    infer_f32 = make_inference_fn(model, variables, cfg)
    infer_u8 = make_inference_fn(model, variables, cfg, wire="compact")

    s0, l0, b0 = jax.tree_util.tree_map(
        np.asarray, infer_f32(batch_f32["rgb"], batch_f32["event"])
    )
    s1, l1, b1 = jax.tree_util.tree_map(
        np.asarray, infer_u8(batch_u8["rgb"], batch_u8["event"])
    )
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)
    np.testing.assert_allclose(b0, b1, atol=1e-4)


def test_compact_train_step_matches_f32(fixture_root):
    """TrainConfig.input_wire='compact': identical losses and parameters vs the
    host-normalized f32 pipeline over two jitted train steps."""
    from frn_tpu.config import TrainConfig
    from frn_tpu.train.loop import create_train_state, make_train_step

    def run(wire):
        cfg = FrameworkConfig(
            geometry=TINY,
            model=ModelConfig(
                variant="fusion", depth=18, num_classes=2, feature_size=32,
                attention_chunk=128,
            ),
            train=TrainConfig(
                batch_size=2, accum_steps=1, max_annots_per_image=8,
                input_wire=wire,
            ),
        )
        ds = DSECDetDataset(
            fixture_root, geometry=TINY, time_window_us=100_000,
            compact_wire=wire == "compact",
        )
        model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tx, cfg, donate=False)
        losses = []
        for i in range(2):
            batch = collate_fixed([ds[2 * i], ds[2 * i + 1]], TINY, max_annots=8)
            state, metrics = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
        return losses, state.params

    losses_f32, params_f32 = run("f32")
    losses_u8, params_u8 = run("compact")
    np.testing.assert_allclose(losses_f32, losses_u8, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        params_f32, params_u8,
    )


def test_auto_input_format_matches_default(fixture_root):
    """make_inference_fn(input_format='auto') — XLA-chosen argument layouts,
    inputs delivered via device_put(x, format) — must produce identical
    detections to the default-layout path (it is the same program; only the
    physical argument layouts differ)."""
    from frn_tpu.eval.detections import make_inference_fn
    from frn_tpu.models.detector import init_detector

    cfg = FrameworkConfig(
        geometry=TINY,
        model=ModelConfig(
            variant="fusion", depth=18, num_classes=2, feature_size=32,
            attention_chunk=128,
        ),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    ds = DSECDetDataset(fixture_root, geometry=TINY, time_window_us=100_000)
    from frn_tpu.data.collate import collate_fixed as _cf

    batch = _cf([ds[0], ds[1]], TINY, batch_size=2)
    infer_d = make_inference_fn(model, variables, cfg)
    infer_a = make_inference_fn(model, variables, cfg, input_format="auto")
    s0, l0, b0 = jax.tree_util.tree_map(
        np.asarray, infer_d(batch["rgb"], batch["event"])
    )
    s1, l1, b1 = jax.tree_util.tree_map(
        np.asarray, infer_a(batch["rgb"], batch["event"])
    )
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)
    np.testing.assert_allclose(b0, b1, atol=1e-4)
    with pytest.raises(ValueError, match="input_format"):
        make_inference_fn(model, variables, cfg, input_format="tiled")


def test_inference_fn_rejects_unknown_wire():
    from frn_tpu.eval.detections import make_inference_fn

    cfg = FrameworkConfig(geometry=TINY, model=ModelConfig(num_classes=2))
    with pytest.raises(ValueError, match="wire"):
        make_inference_fn(None, {}, cfg, wire="int4")
