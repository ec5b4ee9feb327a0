"""Tests for the secondary datasets (NCaltech101, COCO-JSON, OID, AR grouping)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from frn_tpu.data.extra_datasets import (
    CocoJsonDataset,
    NCaltech101Dataset,
    OidDataset,
    group_by_aspect_ratio,
    oid_get_labels,
)

RNG = np.random.default_rng(4)


def _make_ncaltech(root, classes=("airplane", "car"), per_class=2):
    for ci, cls in enumerate(classes):
        d = root / "training" / cls
        a = root / "annotations" / cls
        d.mkdir(parents=True)
        a.mkdir(parents=True)
        for i in range(per_class):
            n = 1000
            with h5py.File(str(d / f"image_{i:04d}.h5"), "w") as f:
                g = f.create_group("events")
                g.create_dataset("x", data=RNG.integers(0, 240, n).astype(np.uint16))
                g.create_dataset("y", data=RNG.integers(0, 180, n).astype(np.uint16))
                g.create_dataset("t", data=np.sort(RNG.integers(0, 2_000_000, n)))
                g.create_dataset("p", data=RNG.integers(0, 2, n).astype(np.uint8))
            # annotation: int16 words; words[2:10] = [x1,y1,x2,?,?,y2,...]
            words = np.zeros(12, np.int16)
            words[2:10] = [20, 30, 120, 0, 0, 110, 0, 0]
            words.tofile(str(a / f"annotation_{i:04d}.bin"))
    return root


def test_ncaltech101(tmp_path):
    _make_ncaltech(tmp_path)
    ds = NCaltech101Dataset(str(tmp_path))
    assert len(ds) == 4
    assert ds.num_classes() == 2
    s = ds[0]
    assert s["event"].shape == (180, 240, 5)
    ann = s["annot"]
    np.testing.assert_allclose(ann[0, :4], [20, 30, 120, 110])
    assert ann[0, 4] in (0, 1)


def test_coco_json_dataset(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(img_dir / name), RNG.integers(0, 255, (40, 60, 3)).astype(np.uint8))
    coco = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 60, "height": 40},
            {"id": 3, "file_name": "b.jpg", "width": 60, "height": 40},
        ],
        "categories": [{"id": 10, "name": "cat"}, {"id": 2, "name": "dog"}],
        "annotations": [
            {"image_id": 7, "bbox": [5, 5, 20, 10], "category_id": 10, "iscrowd": 0},
            {"image_id": 7, "bbox": [0, 0, 10, 10], "category_id": 2, "iscrowd": 0},
            {"image_id": 3, "bbox": [1, 1, 0.5, 8], "category_id": 2, "iscrowd": 0},  # degenerate
        ],
    }
    jf = tmp_path / "instances.json"
    jf.write_text(json.dumps(coco))
    ds = CocoJsonDataset(str(img_dir), str(jf))
    assert len(ds) == 2 and ds.num_classes() == 2
    assert ds.label_to_name(0) == "dog"  # sorted by original id: 2 -> 0, 10 -> 1
    ann = ds.load_annotations(ds.image_ids.index(7))
    assert len(ann) == 2
    np.testing.assert_allclose(sorted(ann[:, 4]), [0, 1])
    assert len(ds.load_annotations(ds.image_ids.index(3))) == 0  # degenerate dropped
    s = ds[0]
    assert s["rgb"].shape == (40, 60, 3)


def test_oid_dataset(tmp_path):
    meta = tmp_path / "meta"
    meta.mkdir()
    (meta / "class-descriptions-boxable.csv").write_text("/m/01,Person\n/m/02,Car\n")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "img1.jpg"), RNG.integers(0, 255, (50, 100, 3)).astype(np.uint8))
    ann = tmp_path / "ann.csv"
    ann.write_text(
        "ImageID,LabelName,XMin,XMax,YMin,YMax\n"
        "img1,/m/01,0.1,0.5,0.2,0.8\n"
        "img1,/m/99,0.0,1.0,0.0,1.0\n"  # unknown label skipped
    )
    id_to_labels, cls_index = oid_get_labels(str(meta))
    assert id_to_labels == {0: "Person", 1: "Car"}
    ds = OidDataset(str(img_dir), str(meta), str(ann))
    assert len(ds) == 1 and ds.num_classes() == 2
    a = ds.load_annotations(0)
    assert len(a) == 1
    np.testing.assert_allclose(a[0], [10, 10, 50, 40, 0])


def test_aspect_ratio_grouping():
    class FakeDs:
        ratios = [2.0, 0.5, 1.0, 1.5, 0.8]

        def __len__(self):
            return 5

        def image_aspect_ratio(self, i):
            return self.ratios[i]

    groups = group_by_aspect_ratio(FakeDs(), batch_size=2, shuffle_groups=False)
    flat = [i for g in groups for i in g]
    # sorted by ratio: 1 (0.5), 4 (0.8), 2 (1.0), 3 (1.5), 0 (2.0), wrap to 1
    assert flat == [1, 4, 2, 3, 0, 1]
