"""Non-local cross-attention core, memory-safe on TPU.

The reference computes the full (HW x HW) attention matrix (Attention.py:29-32) —
368M elements per direction at DSEC stage-1 resolution (120x160 = 19,200 tokens),
~1.5 GB in f32. Here the softmax(QK^T)V contraction is computed in query blocks with
lax.map, bounding live memory to (chunk x HW) while keeping results bit-identical
(softmax over the full key dim is exact per row, no online renormalization needed
because each row's scores are materialized whole).

Semantic note (checkpoint parity): the reference reinterprets the attention output
(B, HW, C/8) directly as NCHW (B, C/8, H, W) via torch .view with NO permute
(Attention.py:32) — a memory-layout reinterpretation that scrambles channels and
positions. The same reinterpretation is replicated exactly here with jnp.reshape
(both are row-major), then transposed to NHWC for the following 1x1 conv.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# HW above which the Pallas flash kernel is used on TPU (below it, the dense
# einsum path is already compute-bound and simpler)
FLASH_MIN_TOKENS = 4096


def nonlocal_attention(
    g: jnp.ndarray,  # (B, HW, C8) values, from the content stream x0
    theta: jnp.ndarray,  # (B, HW, C8) keys, from the style stream x1
    phi: jnp.ndarray,  # (B, HW, C8) queries, from the style stream x1
    chunk: int = 1024,
    exp_bf16: bool = False,  # inference-only bf16-exp softmax weights
    quant: str | None = None,  # inference-only int8 mode ('int8' | 'int8_qk')
) -> jnp.ndarray:
    """softmax(phi . theta^T) . g -> (B, HW, C8). No 1/sqrt(d) scaling (matches ref).

    quant selects the int8 serving kernel (ModelConfig.attention_quant) where
    the flash path applies; calls below FLASH_MIN_TOKENS or off-TPU run the
    exact dense route regardless (stage-3/4 attention is a negligible share).
    """
    b, hw, c8 = g.shape

    # The Pallas kernel reserves one of the 128 lanes for the key-padding bias
    # (flash_attention.py asserts d < 128), so a head dim >= 128 — reachable via
    # --image_height 1024 --image_width 1280 custom geometries, where stage-3 has
    # C/8 = 128 — must take the chunked route instead of tripping the assert
    # inside jit tracing.
    if (
        hw >= FLASH_MIN_TOKENS
        and c8 < 128
        and not os.environ.get("FRN_DISABLE_FLASH")
    ):
        from frn_tpu.ops.flash_attention import (
            flash_attention_available,
            flash_nonlocal_attention,
            flash_nonlocal_attention_bf16exp,
            flash_nonlocal_attention_int8,
        )

        if flash_attention_available():
            if quant:
                return flash_nonlocal_attention_int8(g, theta, phi, mode=quant)
            if exp_bf16:
                return flash_nonlocal_attention_bf16exp(g, theta, phi)
            return flash_nonlocal_attention(g, theta, phi)
    if hw <= chunk:
        scores = jnp.einsum(
            "bqc,bkc->bqk", phi, theta, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(scores, axis=-1).astype(g.dtype)
        return jnp.einsum("bqk,bkc->bqc", attn, g, preferred_element_type=jnp.float32).astype(g.dtype)

    # pad HW to a multiple of chunk, process query blocks sequentially
    num_chunks = -(-hw // chunk)
    pad = num_chunks * chunk - hw
    phi_p = jnp.pad(phi, ((0, 0), (0, pad), (0, 0)))
    phi_blocks = phi_p.reshape(b, num_chunks, chunk, c8).transpose(1, 0, 2, 3)

    def one_block(phi_blk):  # (B, chunk, C8)
        scores = jnp.einsum(
            "bqc,bkc->bqk", phi_blk, theta, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(scores, axis=-1).astype(g.dtype)
        return jnp.einsum(
            "bqk,bkc->bqc", attn, g, preferred_element_type=jnp.float32
        ).astype(g.dtype)

    y = jax.lax.map(one_block, phi_blocks)  # (num_chunks, B, chunk, C8)
    y = y.transpose(1, 0, 2, 3).reshape(b, num_chunks * chunk, c8)
    return y[:, :hw, :]


def reference_view_to_nhwc(y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Replicate the reference's layout quirk then convert to NHWC.

    torch: y (B, HW, C8) contiguous --view--> (B, C8, H, W). Identical memory
    reinterpretation in row-major jnp is a plain reshape; transpose to NHWC after.
    """
    b, hw, c8 = y.shape
    y_nchw = y.reshape(b, c8, h, w)
    return y_nchw.transpose(0, 2, 3, 1)
