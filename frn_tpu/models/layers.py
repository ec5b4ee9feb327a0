"""Primitive flax layers with torch-compatible numerics.

All tensors are NHWC (TPU-native layout; XLA tiles the channel dim onto lanes).
Convolutions use explicit torch-style symmetric padding — NOT XLA 'SAME', whose
asymmetric pad split differs for even inputs and would break checkpoint parity.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_conv_init(kernel_size: int, out_channels: int) -> Callable:
    """Reference init for all backbone/FPN/head convs (model.py:229-232):
    normal(0, sqrt(2 / (k*k*out_channels)))."""
    std = math.sqrt(2.0 / (kernel_size * kernel_size * out_channels))
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def torch_default_conv_init() -> Callable:
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) ==
    uniform(+-1/sqrt(fan_in)). Used where the reference's global re-init loop does
    NOT reach: the REFusion 1x1 convs are registered after the loop runs
    (model.py:229-235 vs :247-252), so they keep torch defaults."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_default_bias_init(fan_in: int) -> Callable:
    """torch conv bias default: uniform(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def c2_xavier_init() -> Callable:
    """fvcore c2_xavier_fill (Attention.py:16-17): kaiming_uniform(a=1) ==
    uniform(+-sqrt(3 / fan_in)), bias zero."""
    def init(key, shape, dtype=jnp.float32):
        # flax conv kernel shape: (kh, kw, in, out); fan_in = kh*kw*in
        fan_in = shape[0] * shape[1] * shape[2]
        bound = math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv(nn.Module):
    """2D conv, NHWC, explicit symmetric padding (torch semantics)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        init = self.kernel_init or torch_conv_init(self.kernel_size, self.features)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding), (self.padding, self.padding)],
            use_bias=self.use_bias,
            kernel_init=init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen running statistics.

    The reference calls freeze_bn() at construction and before every train/eval run
    (model.py:245,270-274, train scripts), so batch statistics are never updated —
    only the affine (gamma, beta) trains. Here mean/var live in the 'batch_stats'
    collection (never mutated) and gamma/beta in 'params'.
    """

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        # fold into one multiply-add (fuses into the preceding conv under XLA)
        inv = jax.lax.rsqrt(var.value + self.epsilon) * gamma
        y = x * inv.astype(x.dtype) + (beta - mean.value * inv).astype(x.dtype)
        return y


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )
