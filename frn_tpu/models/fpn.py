"""Five-level FPN (P2..P6) — one octave finer than stock RetinaNet.

Re-implements PyramidFeatures (model.py:21-82): lateral 1x1 convs on C2..C5,
top-down adds with dataset-specific upsampling (nearest x2 for DSEC; fixed-size
bilinear align_corners=False for DDD17's non-divisible geometry), 3x3 output
convs, and P6 = stride-2 3x3 conv on C5.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from frn_tpu.models.layers import Conv
from frn_tpu.ops.upsample import bilinear_resize, nearest_upsample_2x


class PyramidFeatures(nn.Module):
    feature_size: int = 256
    upsample: str = "nearest2x"  # 'nearest2x' | 'bilinear_fixed'
    dtype: Optional[jnp.dtype] = None

    def _up(self, x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
        if self.upsample == "nearest2x":
            y = nearest_upsample_2x(x)
            # crop to the finer level's exact (ceil-division) shape; a no-op for
            # 32-divisible geometries (the reference would shape-error otherwise)
            return y[:, : target_hw[0], : target_hw[1], :]
        return bilinear_resize(x, target_hw)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        c2, c3, c4, c5 = feats
        fs = self.feature_size

        p5 = Conv(fs, 1, 1, 0, dtype=self.dtype, name="P5_1")(c5)
        p5_up = self._up(p5, c4.shape[1:3])
        p5_out = Conv(fs, 3, 1, 1, dtype=self.dtype, name="P5_2")(p5)

        p4 = Conv(fs, 1, 1, 0, dtype=self.dtype, name="P4_1")(c4) + p5_up
        p4_up = self._up(p4, c3.shape[1:3])
        p4_out = Conv(fs, 3, 1, 1, dtype=self.dtype, name="P4_2")(p4)

        p3 = Conv(fs, 1, 1, 0, dtype=self.dtype, name="P3_1")(c3) + p4_up
        p3_up = self._up(p3, c2.shape[1:3])
        p3_out = Conv(fs, 3, 1, 1, dtype=self.dtype, name="P3_2")(p3)

        p2 = Conv(fs, 1, 1, 0, dtype=self.dtype, name="P2_1")(c2) + p3_up
        p2_out = Conv(fs, 3, 1, 1, dtype=self.dtype, name="P2_2")(p2)

        p6_out = Conv(fs, 3, 2, 1, dtype=self.dtype, name="P6")(c5)

        return (p2_out, p3_out, p4_out, p5_out, p6_out)
