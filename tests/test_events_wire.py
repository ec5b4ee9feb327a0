"""Raw-stream ('events') wire for the TRAIN input pipeline (VERDICT-r4 #8).

`DSECDetDataset(events_wire=True)` ships padded x/y/t/p streams (13 B/event)
instead of voxel grids; `TrainConfig.input_wire='events'` rasterizes them ON
DEVICE inside the jitted step (ops/voxelize.voxelize_events_batched) and
applies the conditional tanh squash. This is the loader escape hatch when host
cores — not the wire — bound the input pipeline (the reference's hottest
loader op is the python voxelization loop, dsec_data.py:347-387).

Exactness: the device voxelizer's integer binning is bit-exact vs the host
path (3-way agreement in test_voxelize.py); here we pin the full wire —
dataset emission -> collate -> jitted train step — against the f32 pipeline.
"""

import dataclasses

import jax
import numpy as np
import pytest

from frn_tpu.config import DSEC_DET, FrameworkConfig, ModelConfig, TrainConfig
from frn_tpu.data.collate import collate_fixed
from frn_tpu.data.dsec_det import DSECDetDataset
from frn_tpu.data.synthetic import make_dsec_det_fixture

TINY = dataclasses.replace(DSEC_DET, height=96, width=128)
CAP = 8192


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec_det_events_wire")
    make_dsec_det_fixture(
        str(root), num_sequences=1, frames_per_sequence=6, geometry=TINY
    )
    return str(root)


def test_events_wire_rejects_bad_combos(fixture_root):
    with pytest.raises(ValueError, match="exclusive"):
        DSECDetDataset(
            fixture_root, geometry=TINY, compact_wire=True, events_wire=True
        )
    with pytest.raises(ValueError, match="voxel"):
        DSECDetDataset(
            fixture_root, geometry=TINY, events_wire=True,
            event_representation="time_surface",
        )


def test_events_samples_device_voxelize_to_f32(fixture_root):
    """Device rasterization of the wire arrays == the host-voxelized sample."""
    from frn_tpu.ops.voxelize import (
        normalize_event_voxel_np,
        voxelize_events,
    )

    ds_f32 = DSECDetDataset(fixture_root, geometry=TINY, time_window_us=100_000)
    ds_ev = DSECDetDataset(
        fixture_root, geometry=TINY, time_window_us=100_000,
        events_wire=True, event_capacity=CAP,
    )
    assert len(ds_f32) == len(ds_ev) > 0
    for i in range(len(ds_ev)):
        a, b = ds_f32[i], ds_ev[i]
        assert b["rgb"].dtype == np.uint8
        assert b["event_x"].dtype == np.int16
        assert b["event_t"].dtype == np.int32
        assert b["event_p"].dtype == np.int8
        assert int(b["event_n"]) <= CAP
        np.testing.assert_array_equal(a["rgb"], b["rgb"].astype(np.float32) / 255.0)
        vox = np.asarray(
            voxelize_events(
                b["event_x"].astype(np.int32),
                b["event_y"].astype(np.int32),
                b["event_t"],
                b["event_p"].astype(np.int32),
                b["event_n"],
                num_bins=TINY.event_channels,
                height=TINY.height,
                width=TINY.width,
            )
        )
        vox = normalize_event_voxel_np(vox)
        np.testing.assert_allclose(
            a["event"], np.transpose(vox, (1, 2, 0)), atol=1e-6
        )
        np.testing.assert_array_equal(a["annot"], b["annot"])


def test_collate_events_wire_shapes(fixture_root):
    ds = DSECDetDataset(
        fixture_root, geometry=TINY, events_wire=True, event_capacity=CAP
    )
    batch = collate_fixed([ds[0], ds[1]], TINY, max_annots=8, batch_size=4)
    assert batch["event_x"].shape == (4, CAP)
    assert batch["event_x"].dtype == np.int16
    assert batch["event_t"].dtype == np.int32
    assert batch["event_n"].shape == (4,)
    assert batch["rgb"].dtype == np.uint8
    assert batch["rgb"].shape == (4, TINY.height, TINY.width, 3)
    assert "event" not in batch
    assert batch["sample_mask"].tolist() == [True, True, False, False]
    # batch-padding rows carry zero valid events
    assert batch["event_n"][2:].tolist() == [0, 0]


def test_events_wire_capacity_truncation(fixture_root):
    """Windows beyond capacity keep their FIRST event_capacity events."""
    ds_big = DSECDetDataset(
        fixture_root, geometry=TINY, events_wire=True, event_capacity=CAP
    )
    n_full = int(ds_big[0]["event_n"])
    cap = max(4, n_full // 2)
    ds_small = DSECDetDataset(
        fixture_root, geometry=TINY, events_wire=True, event_capacity=cap
    )
    s = ds_small[0]
    assert int(s["event_n"]) == min(n_full, cap)
    assert s["event_x"].shape == (cap,)
    big = ds_big[0]
    np.testing.assert_array_equal(s["event_x"], big["event_x"][:cap])


def test_events_train_step_matches_f32(fixture_root):
    """TrainConfig.input_wire='events': identical losses and parameters vs the
    host-voxelized f32 pipeline over two jitted train steps."""
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
            events_wire=wire == "events", event_capacity=CAP,
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
    losses_ev, params_ev = run("events")
    np.testing.assert_allclose(losses_f32, losses_ev, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        params_f32, params_ev,
    )
