"""Raw DSEC-Det dataset tests over the synthetic on-disk fixture."""

import dataclasses

import numpy as np
import pytest

from frn_tpu.config import DSEC_DET
from frn_tpu.data.dsec_det import (
    DSECDetDataset,
    compute_class_mapping,
    CLASS_MAPPING,
    SOURCE_CLASSES,
    filter_small_boxes,
)
from frn_tpu.data.synthetic import make_dsec_det_fixture

TINY = dataclasses.replace(DSEC_DET, height=96, width=128)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec_det")
    make_dsec_det_fixture(str(root), num_sequences=2, frames_per_sequence=6, geometry=TINY)
    return str(root)


def test_class_mapping_matches_reference():
    remap = compute_class_mapping(("car", "pedestrian"), SOURCE_CLASSES, CLASS_MAPPING)
    # pedestrian->1, rider->-1, car->0, bus->0, truck->0, bicycle/motorcycle/train->-1
    np.testing.assert_array_equal(remap, [1, -1, 0, 0, 0, -1, -1, -1])


def test_filter_small_boxes():
    w = np.array([5.0, 25.0, 25.0])
    h = np.array([25.0, 5.0, 25.0])
    keep = filter_small_boxes(w, h, min_height=20, min_diag=30)
    np.testing.assert_array_equal(keep, [False, False, True])


def test_dataset_walk_and_pairs(fixture_root):
    ds = DSECDetDataset(fixture_root, geometry=TINY)
    assert len(ds.sequences) == 2
    # 6 frames per sequence, all annotated -> 5 consecutive pairs each
    assert len(ds) == 10
    assert ds.num_classes() == 2
    assert ds.label_to_name(0) == "car"


def test_dataset_sample_contents(fixture_root):
    ds = DSECDetDataset(fixture_root, geometry=TINY, time_window_us=100_000)
    s = ds[0]
    assert s["event"].shape == (TINY.height, TINY.width, 5)
    assert s["rgb"].shape == (TINY.height, TINY.width, 3)
    assert s["rgb"].min() >= 0 and s["rgb"].max() <= 1
    assert np.abs(s["event"]).sum() > 0  # events landed in the voxel grid
    ann = s["annot"]
    assert ann.shape[1] == 5 and len(ann) == 2  # two tracked objects
    assert set(ann[:, 4].astype(int)) <= {0, 1}
    # boxes inside the image
    assert (ann[:, 0] >= 0).all() and (ann[:, 2] <= TINY.width).all()


def test_split_config_filters_sequences(fixture_root):
    cfgs = {"train": ["synthetic_00"], "val": ["synthetic_01"]}
    tr = DSECDetDataset(fixture_root, split="train", split_config=cfgs, geometry=TINY)
    va = DSECDetDataset(fixture_root, split="val", split_config=cfgs, geometry=TINY)
    assert len(tr.sequences) == 1 and tr.sequences[0].name == "synthetic_00"
    assert len(va.sequences) == 1 and va.sequences[0].name == "synthetic_01"


def test_min_size_filter_removes_everything(fixture_root):
    ds = DSECDetDataset(fixture_root, geometry=TINY, min_bbox_height=500, min_bbox_diag=900)
    assert len(ds) == 0


def test_annotations_match_tracks(fixture_root):
    ds = DSECDetDataset(fixture_root, geometry=TINY)
    si, i0, i1 = ds._index[0]
    seq = ds.sequences[si]
    ts1 = int(seq.timestamps[i1])
    raw = seq.tracks[seq.tracks["t"] == ts1]
    ann = ds.load_annotations(0)
    assert len(ann) == len(raw)
    # x2-x1 == w (within crop clamping)
    np.testing.assert_allclose(ann[:, 2] - ann[:, 0], np.minimum(raw["w"], TINY.width - 1 - raw["x"]), atol=1e-4)


def test_only_perfect_tracks(fixture_root):
    # fixture objects drift 4px/frame with constant size -> IoU >> 0.1, same ids
    ds_all = DSECDetDataset(fixture_root, geometry=TINY)
    ds_perfect = DSECDetDataset(fixture_root, geometry=TINY, only_perfect_tracks=True)
    assert len(ds_perfect) == len(ds_all)  # synthetic tracks are all continuous

    # corrupt one frame's tracks: drop an object at one timestamp
    import numpy as np

    seq = ds_all.sequences[0]
    tracks = seq.tracks.copy()
    ts_mid = int(seq.timestamps[2])
    keep = ~((tracks["t"] == ts_mid) & (tracks["track_id"] == 1))
    np.save(str(seq.root / "object_detections/left/tracks.npy"), tracks[keep])
    try:
        ds2 = DSECDetDataset(fixture_root, geometry=TINY, only_perfect_tracks=True)
        # pairs touching the corrupted frame are dropped
        assert len(ds2) < len(ds_perfect)
    finally:
        np.save(str(seq.root / "object_detections/left/tracks.npy"), tracks)
