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


class _SpaceToDepthConv(nn.Module):
    """Stride-2 kxk conv evaluated as a (k+1)/2-sized stride-1 conv on a 2x2
    space-to-depth input — numerically the identical contraction, but without
    the tiny-input-channel (3/5 ch) large-kernel conv that XLA:TPU lowers
    poorly (measured ~2 ms per 7x7 stem vs ~0.1 ms for this form).

    The parameter keeps the ORIGINAL (k, k, cin, cout) layout (checkpoint and
    converter compatible); rearrangement to (k2, k2, 4*cin, cout) happens at
    apply time on the ~150 KB weight.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: Optional[jnp.dtype]

    @nn.compact
    def __call__(self, x):
        k, p = self.kernel_size, self.padding
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (k, k, cin, self.features))
        dtype = self.dtype or x.dtype
        kp = k + (-k % 2)  # pad kernel to even extent
        k2 = kp // 2
        w = jnp.pad(kernel, ((0, kp - k), (0, kp - k), (0, 0), (0, 0)))
        # (kp,kp,C,O) -> (k2,2,k2,2,C,O) -> (k2,k2,2,2,C,O) -> (k2,k2,4C,O);
        # s2d channel index = py*2C + px*C + c, matching the input reshape below
        w = w.reshape(k2, 2, k2, 2, cin, self.features)
        w = w.transpose(0, 2, 1, 3, 4, 5).reshape(k2, k2, 4 * cin, self.features)

        b, h, wdt = x.shape[0], x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (p, p + (h + 2 * p) % 2), (p, p + (wdt + 2 * p) % 2), (0, 0)))
        hh, ww = xp.shape[1] // 2, xp.shape[2] // 2
        x2 = xp.reshape(b, hh, 2, ww, 2, cin).transpose(0, 1, 3, 2, 4, 5)
        x2 = x2.reshape(b, hh, ww, 4 * cin)

        y = jax.lax.conv_general_dilated(
            x2.astype(dtype), w.astype(dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


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
    space_to_depth: bool = False  # stride-2 stems only; exact rewrite

    @nn.compact
    def __call__(self, x):
        init = self.kernel_init or torch_conv_init(self.kernel_size, self.features)
        if self.space_to_depth:
            assert self.stride == 2, "space_to_depth implements stride-2 convs"
            return _SpaceToDepthConv(
                features=self.features, kernel_size=self.kernel_size,
                stride=self.stride, padding=self.padding, use_bias=self.use_bias,
                kernel_init=init, bias_init=self.bias_init, dtype=self.dtype,
                name="Conv_0",  # same param path as the nn.Conv branch
            )(x)
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
