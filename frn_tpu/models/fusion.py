"""Cross-modal fusion: AdaIN + bidirectional non-local cross-attention + REFusion.

Re-implements retinanet/{AdaIN,Attention,fusion}.py as NHWC flax modules with the
attention contraction running blockwise (ops/attention.py) so the 19,200-token
stage-1 attention never materializes the full (HW)^2 matrix in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from frn_tpu.models.layers import (
    Conv,
    c2_xavier_init,
    torch_default_bias_init,
    torch_default_conv_init,
)
from frn_tpu.ops.attention import nonlocal_attention, reference_view_to_nhwc


def adain(content: jnp.ndarray, style: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance normalization (AdaIN.py:17-26), NHWC.

    Per-(batch, channel) mean/std over spatial positions; unbiased variance (torch
    .var default ddof=1), eps added to the variance before sqrt.
    """
    def mean_std(feat):
        b, h, w, c = feat.shape
        flat = feat.reshape(b, h * w, c).astype(jnp.float32)
        mean = jnp.mean(flat, axis=1, keepdims=True)
        var = jnp.sum((flat - mean) ** 2, axis=1, keepdims=True) / max(h * w - 1, 1)
        std = jnp.sqrt(var + eps)
        return mean.reshape(b, 1, 1, c), std.reshape(b, 1, 1, c)

    s_mean, s_std = mean_std(style)
    c_mean, c_std = mean_std(content)
    normalized = (content.astype(jnp.float32) - c_mean) / c_std
    return (normalized * s_std + s_mean).astype(content.dtype)


class CrossAttentionBlock(nn.Module):
    """Non-local block (Attention.py:7-36): values g from x0, keys/queries from x1,
    C/8 bottleneck, softmax attention, 1x1 W projection back to C, then
    AdaIN(x0, W_y)."""

    in_channels: int
    chunk: int = 1024
    dtype: Optional[jnp.dtype] = None
    exp_bf16: bool = False  # inference-only flash softmax option (config.py)
    quant: Optional[str] = None  # inference-only int8 attention (config.py)

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x0.shape
        c8 = self.in_channels // 8
        xavier = c2_xavier_init()

        g = Conv(c8, 1, 1, 0, kernel_init=xavier, dtype=self.dtype, name="g")(x0)
        theta = Conv(c8, 1, 1, 0, kernel_init=xavier, dtype=self.dtype, name="theta")(x1)
        phi = Conv(c8, 1, 1, 0, kernel_init=xavier, dtype=self.dtype, name="phi")(x1)

        hw = h * w
        y = nonlocal_attention(
            g.reshape(b, hw, c8), theta.reshape(b, hw, c8), phi.reshape(b, hw, c8),
            chunk=self.chunk, exp_bf16=self.exp_bf16, quant=self.quant,
        )
        # replicate the reference's (B,HW,C8)->(B,C8,H,W) view (Attention.py:32)
        y = reference_view_to_nhwc(y, h, w)
        w_y = Conv(self.in_channels, 1, 1, 0, kernel_init=xavier, dtype=self.dtype, name="W")(y)
        return adain(x0, w_y)


class REFusion(nn.Module):
    """Per-stage fusion (fusion.py:7-36): 1x1 convs on both streams, multiplicative
    interaction added back to each, two cross-attention directions, channel concat.

    The detector calls this as fusion(event_feat, rgb_feat) — note the reference
    passes (event, rgb) into parameters named (rgb, evt) (model.py:305-308); stream
    names here follow the *actual* dataflow: stream_a = event, stream_b = rgb, with
    parameter names kept as conv0_rgb/conv0_evt for checkpoint-converter parity.
    """

    channels: int
    chunk: int = 1024
    dtype: Optional[jnp.dtype] = None
    exp_bf16: bool = False
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # torch-default init: the reference's re-init loop runs before self.fus is
        # assigned (model.py:229 vs :247), so these keep nn.Conv2d defaults — with
        # the larger sqrt(2/n) init, the multiplicative interaction below amplifies
        # feature magnitudes ~6x per stage and the random-init model explodes.
        init = torch_default_conv_init()
        bias = torch_default_bias_init(self.channels)
        a0 = Conv(self.channels, 1, 1, 0, kernel_init=init, bias_init=bias,
                  dtype=self.dtype, name="conv0_rgb")(a)
        b0 = Conv(self.channels, 1, 1, 0, kernel_init=init, bias_init=bias,
                  dtype=self.dtype, name="conv0_evt")(b)
        mul = a0 * b0
        a1 = a0 + mul
        b1 = b0 + mul

        y_a = CrossAttentionBlock(
            self.channels, self.chunk, self.dtype, self.exp_bf16, self.quant,
            name="rgb_cross_attention",
        )(a1, b1)
        y_b = CrossAttentionBlock(
            self.channels, self.chunk, self.dtype, self.exp_bf16, self.quant,
            name="event_cross_attention",
        )(b1, a1)
        return jnp.concatenate([y_a, y_b], axis=-1)
