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
    fused_attention: bool = False  # ModelConfig.fused_attention

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

        if self.fused_attention and not self.is_initializing():
            return self._fused_dual_attention(a1, b1)

        y_a = CrossAttentionBlock(
            self.channels, self.chunk, self.dtype, self.exp_bf16, self.quant,
            name="rgb_cross_attention",
        )(a1, b1)
        y_b = CrossAttentionBlock(
            self.channels, self.chunk, self.dtype, self.exp_bf16, self.quant,
            name="event_cross_attention",
        )(b1, a1)
        return jnp.concatenate([y_a, y_b], axis=-1)

    def _fused_dual_attention(self, a1: jnp.ndarray, b1: jnp.ndarray) -> jnp.ndarray:
        """Both cross-attention directions in one pass over the SAME params.

        Direction A (rgb_cross_attention) is attn(x0=a1, x1=b1); direction B
        (event_cross_attention) is attn(x0=b1, x1=a1). Each stream feeds three
        C->C/8 projections — g of its own direction plus theta/phi of the
        other — so the three convs concatenate into one C->3C/8 conv per
        stream (identical weight columns => identical per-output dot
        products). The attention contraction batches the two directions on
        the kernel grid dim (2B; per-batch independent => exact), and the two
        C/8->C W projections run as one 2-group batched matmul.
        """
        p = self.variables["params"]
        b, h, w, c = a1.shape
        c8 = self.channels // 8
        hw = h * w
        dtype = self.dtype or a1.dtype

        def kb(block: str, name: str):
            cp = p[block][name]["Conv_0"]
            return cp["kernel"][0, 0], cp["bias"]  # (C, c8), (c8,)

        # from a1: g_A, theta_B, phi_B; from b1: g_B, theta_A, phi_A
        kgA, bgA = kb("rgb_cross_attention", "g")
        ktA, btA = kb("rgb_cross_attention", "theta")
        kpA, bpA = kb("rgb_cross_attention", "phi")
        kgB, bgB = kb("event_cross_attention", "g")
        ktB, btB = kb("event_cross_attention", "theta")
        kpB, bpB = kb("event_cross_attention", "phi")

        ka = jnp.concatenate([kgA, ktB, kpB], axis=1).astype(dtype)  # (C, 3c8)
        ba = jnp.concatenate([bgA, btB, bpB], axis=0).astype(dtype)
        kb_ = jnp.concatenate([kgB, ktA, kpA], axis=1).astype(dtype)
        bb = jnp.concatenate([bgB, btA, bpA], axis=0).astype(dtype)

        a_flat = a1.reshape(b, hw, c).astype(dtype)
        b_flat = b1.reshape(b, hw, c).astype(dtype)
        pa = jnp.einsum("bnc,co->bno", a_flat, ka) + ba  # (B, HW, 3c8)
        pb = jnp.einsum("bnc,co->bno", b_flat, kb_) + bb

        g_a, th_b, ph_b = pa[..., :c8], pa[..., c8:2 * c8], pa[..., 2 * c8:]
        g_b, th_a, ph_a = pb[..., :c8], pb[..., c8:2 * c8], pb[..., 2 * c8:]

        g = jnp.concatenate([g_a, g_b], axis=0)  # (2B, HW, c8)
        theta = jnp.concatenate([th_a, th_b], axis=0)
        phi = jnp.concatenate([ph_a, ph_b], axis=0)
        y = nonlocal_attention(
            g, theta, phi, chunk=self.chunk, exp_bf16=self.exp_bf16,
            quant=self.quant,
        )  # (2B, HW, c8)

        # reference view quirk (Attention.py:32) on both directions at once,
        # flattened back to token-major for the batched W projection
        y = reference_view_to_nhwc(y, h, w).reshape(2, b, hw, c8)

        wA = p["rgb_cross_attention"]["W"]["Conv_0"]
        wB = p["event_cross_attention"]["W"]["Conv_0"]
        w_k = jnp.stack([wA["kernel"][0, 0], wB["kernel"][0, 0]]).astype(dtype)  # (2, c8, C)
        w_b = jnp.stack([wA["bias"], wB["bias"]]).astype(dtype)  # (2, C)
        w_y = jnp.einsum("dbnc,dco->dbno", y, w_k) + w_b[:, None, None, :]
        w_y = w_y.reshape(2, b, h, w, c)

        y_a = adain(a1, w_y[0])
        y_b = adain(b1, w_y[1])
        return jnp.concatenate([y_a, y_b], axis=-1)
