"""Static anchor generation.

The reference regenerates anchors with numpy inside every forward pass and ships them
to the device (retinanet/anchors.py:25-45) — a host round-trip per step. Here anchors
are a pure function of the (static) image shape, computed once at trace time and baked
into the compiled program as a constant.

Semantics replicated from retinanet/anchors.py:
  * pyramid levels [2,3,4,5,6] -> strides [4,8,16,32,64], base sizes [16,32,64,128,256]
  * 3 ratios x 3 scales = 9 anchors per cell, (x1,y1,x2,y2) corner format
  * per-level grid shape = ceil(image_shape / stride)   (anchors.py:30)
  * cell centers at (i + 0.5) * stride                  (anchors.py shift())
Totals: 230,220 anchors @480x640 (DSEC), 68,490 @260x346 (DDD17).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import numpy as np

from frn_tpu.config import AnchorConfig


def generate_base_anchors(
    base_size: float,
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (1.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0)),
) -> np.ndarray:
    """(len(ratios)*len(scales), 4) anchors centered at the origin.

    Enumeration order matches the reference (anchors.py generate_anchors): for each
    ratio, all scales — ratio-major, scale-minor. Width is adjusted to preserve the
    area of the scaled square, height = width * ratio.
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    num = len(ratios) * len(scales)

    # side length for each (ratio, scale) pair; scales cycle fastest
    side = base_size * np.tile(scales, len(ratios))  # (num,)
    areas = side * side
    ratio_rep = np.repeat(ratios, len(scales))  # (num,)

    w = np.sqrt(areas / ratio_rep)
    h = w * ratio_rep

    anchors = np.zeros((num, 4), dtype=np.float64)
    anchors[:, 0] = -0.5 * w
    anchors[:, 1] = -0.5 * h
    anchors[:, 2] = 0.5 * w
    anchors[:, 3] = 0.5 * h
    return anchors


def level_shapes(image_shape: Tuple[int, int], levels: Sequence[int]) -> list:
    """Feature-grid (H, W) per pyramid level, ceil division (anchors.py:30)."""
    h, w = image_shape
    return [(math.ceil(h / 2 ** lvl), math.ceil(w / 2 ** lvl)) for lvl in levels]


def _shift_anchors(grid_shape: Tuple[int, int], stride: int, base: np.ndarray) -> np.ndarray:
    gh, gw = grid_shape
    cx = (np.arange(gw, dtype=np.float64) + 0.5) * stride
    cy = (np.arange(gh, dtype=np.float64) + 0.5) * stride
    sx, sy = np.meshgrid(cx, cy)  # (gh, gw), row-major: y-major then x
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)  # (K,4)
    out = base[None, :, :] + shifts[:, None, :]  # (K, A, 4)
    return out.reshape(-1, 4)


@functools.lru_cache(maxsize=32)
def anchors_for_shape(
    image_shape: Tuple[int, int], cfg: AnchorConfig = AnchorConfig()
) -> np.ndarray:
    """All anchors for an image shape, (A_total, 4) float32, level-major order.

    Within a level, cells are row-major (y then x) and the 9 base anchors cycle
    fastest — identical ordering to the reference so head outputs align 1:1.
    """
    shapes = level_shapes(image_shape, cfg.pyramid_levels)
    per_level = []
    for (gshape, stride, size) in zip(shapes, cfg.strides, cfg.sizes):
        base = generate_base_anchors(size, cfg.ratios, cfg.scales)
        per_level.append(_shift_anchors(gshape, stride, base))
    return np.concatenate(per_level, axis=0).astype(np.float32)


def num_anchors_for_shape(image_shape: Tuple[int, int], cfg: AnchorConfig = AnchorConfig()) -> int:
    shapes = level_shapes(image_shape, cfg.pyramid_levels)
    return cfg.num_anchors_per_cell * sum(h * w for h, w in shapes)
