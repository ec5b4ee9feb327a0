"""Shared RetinaNet classification / regression heads.

Re-implements RegressionModel / ClassificationModel (model.py:85-168): 4x
(3x3 conv + ReLU) towers + output conv, shared across pyramid levels. Output
reshaping preserves the reference anchor order (cells row-major, the 9 base anchors
fastest) — NHWC gives this for free. Classification output conv is zero-init with
prior bias -log((1-p)/p) (model.py:237-243); regression output conv zero/zero.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from frn_tpu.models.layers import Conv


class RegressionHead(nn.Module):
    num_anchors: int = 9
    feature_size: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(1, 5):
            x = nn.relu(Conv(self.feature_size, 3, 1, 1, dtype=self.dtype, name=f"conv{i}")(x))
        out = Conv(
            self.num_anchors * 4, 3, 1, 1,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="output",
        )(x)
        b = out.shape[0]
        return out.reshape(b, -1, 4)


class ClassificationHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    feature_size: int = 256
    prior: float = 0.01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(1, 5):
            x = nn.relu(Conv(self.feature_size, 3, 1, 1, dtype=self.dtype, name=f"conv{i}")(x))
        bias_value = -math.log((1.0 - self.prior) / self.prior)
        out = Conv(
            self.num_anchors * self.num_classes, 3, 1, 1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="output",
        )(x)
        out = nn.sigmoid(out.astype(jnp.float32))
        b = out.shape[0]
        return out.reshape(b, -1, self.num_classes)


def apply_heads(
    cls_head: nn.Module, reg_head: nn.Module, features: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run shared heads over all pyramid levels, concat along the anchor dim."""
    regression = jnp.concatenate([reg_head(f) for f in features], axis=1)
    classification = jnp.concatenate([cls_head(f) for f in features], axis=1)
    return classification, regression
