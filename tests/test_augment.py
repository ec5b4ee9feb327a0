"""Event augmentation tests, incl. native-vs-python subsample parity."""

import numpy as np
import pytest

from frn_tpu.data.augment import (
    Compose,
    Crop,
    RandomCrop,
    RandomHFlip,
    RandomTranslate,
    RandomZoom,
    _subsample_python,
    bilinear_event_subsample,
    default_augmentations,
)
from frn_tpu.utils.native import native_event_subsample

RNG = np.random.default_rng(2)
H, W = 60, 80


def _sample(n=500, boxes=2):
    annot = []
    for _ in range(boxes):
        x1, y1 = RNG.integers(5, 40, 2)
        annot.append([x1, y1, x1 + 20, y1 + 15, RNG.integers(0, 3)])
    return {
        "x": RNG.integers(0, W, n).astype(np.int64),
        "y": RNG.integers(0, H, n).astype(np.int64),
        "t": np.sort(RNG.integers(0, 10000, n)).astype(np.int64),
        "p": RNG.integers(0, 2, n).astype(np.int8),
        "rgb": RNG.uniform(0, 1, (H, W, 3)).astype(np.float32),
        "annot": np.asarray(annot, np.float32),
    }


def test_hflip_mirrors_everything():
    s = _sample()
    f = RandomHFlip(W, p=1.0)(s)
    np.testing.assert_array_equal(f["x"], W - 1 - s["x"])
    np.testing.assert_allclose(f["rgb"], s["rgb"][:, ::-1])
    np.testing.assert_allclose(f["annot"][:, 0], W - s["annot"][:, 2])
    # width preserved
    np.testing.assert_allclose(
        f["annot"][:, 2] - f["annot"][:, 0], s["annot"][:, 2] - s["annot"][:, 0]
    )


def test_crop_bounds_events_and_boxes():
    s = _sample()
    c = Crop((10, 10), (50, 40))(s)
    assert (c["x"] >= 10).all() and (c["x"] <= 50).all()
    assert (c["y"] >= 10).all() and (c["y"] <= 40).all()
    assert (c["rgb"][:10] == 0).all() and (c["rgb"][41:] == 0).all()


def test_random_crop_shifts_origin():
    s = _sample()
    c = RandomCrop(H, W, 30, 40, seed=5)(s)
    assert c["rgb"].shape == (30, 40, 3)
    assert (c["x"] >= 0).all() and (c["x"] < 40).all()
    if len(c["annot"]):
        assert (c["annot"][:, [0, 2]] <= 40).all()


def test_translate_keeps_events_in_frame():
    s = _sample()
    t = RandomTranslate(H, W, max_shift=25, seed=3)(s)
    assert (t["x"] >= 0).all() and (t["x"] < W).all()
    assert (t["y"] >= 0).all() and (t["y"] < H).all()
    assert len(t["x"]) <= len(s["x"])


@pytest.mark.parametrize("zoom", [(0.7, 0.7), (1.3, 1.3)])
def test_zoom_in_out(zoom):
    s = _sample(n=2000)
    z = RandomZoom(H, W, zoom_range=zoom, seed=1)(s)
    assert (z["x"] >= 0).all() and (z["x"] < W).all()
    assert len(z["x"]) <= len(s["x"])
    assert len(z["x"]) > 0


def test_native_subsample_matches_python():
    n = 400
    pos = RNG.uniform(0, 39, (n, 2)).astype(np.float32)
    pol = np.where(RNG.random(n) > 0.5, 1.0, -1.0).astype(np.float32)
    got = native_event_subsample(pos, pol, 40, 40)
    if got is None:
        pytest.skip("native lib unavailable")
    want_pos, want_mask = _subsample_python(pos, pol, 40, 40)
    np.testing.assert_array_equal(got[1], want_mask)
    np.testing.assert_allclose(got[0][want_mask], want_pos[want_mask], atol=1e-6)


def test_compose_preset_runs():
    s = _sample()
    out = default_augmentations(H, W, seed=7)(s)
    for k in ("x", "y", "t", "p", "rgb", "annot"):
        assert k in out
