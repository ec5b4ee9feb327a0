"""FPN upsampling ops with torch-exact numerics.

The reference FPN upsamples nearest x2 for DSEC (divisible sizes) and to fixed
bilinear target shapes for DDD17's non-divisible 346x260 geometry (model.py:47-56).
Both are implemented here as pure jnp gathers on NHWC tensors, bit-matching
torch.nn.Upsample (align_corners=False for bilinear).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 on NHWC (torch Upsample(scale_factor=2, mode='nearest'))."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def _linear_coeffs(in_size: int, out_size: int):
    """torch area_pixel_compute_source_index with align_corners=False."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = np.clip(src - i0, 0.0, 1.0)
    return i0, i1, lam.astype(np.float32)


def bilinear_resize(x: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize NHWC -> (B, out_h, out_w, C), torch align_corners=False.

    Separable gather+lerp; coefficient tables are trace-time numpy constants, so
    the compiled program is two gathers and two fmas per axis.
    """
    b, h, w, c = x.shape
    oh, ow = out_shape
    if (h, w) == (oh, ow):
        return x

    y0, y1, ly = _linear_coeffs(h, oh)
    x0, x1, lx = _linear_coeffs(w, ow)

    ly = jnp.asarray(ly)[None, :, None, None].astype(x.dtype)
    lx = jnp.asarray(lx)[None, None, :, None].astype(x.dtype)

    top = x[:, y0, :, :]
    bot = x[:, y1, :, :]
    rows = top * (1.0 - ly) + bot * ly  # (B, oh, w, C)

    left = rows[:, :, x0, :]
    right = rows[:, :, x1, :]
    return left * (1.0 - lx) + right * lx
