"""Pallas flash-attention kernel for the non-local fusion attention.

Why this kernel exists: the REFusion cross-attention operates over HW = 19,200
tokens at stage-1 resolution with a C/8 = 32 head dim. The jnp path (XLA) must
materialize (chunk x HW) f32 score matrices in HBM around the softmax — measured
64% of end-to-end inference time, entirely HBM-bandwidth-bound (tools/
profile_components.py). This kernel computes softmax(Q K^T) V with the standard
online-softmax recurrence, keeping scores resident in VMEM: one HBM read of
Q/K/V and one write of O.

Semantics match ops/attention.nonlocal_attention exactly (no 1/sqrt(d) scaling,
softmax over the full key axis; Q=phi, K=theta, V=g per Attention.py:24-31).
The head dim is zero-padded to 128 (TPU lane width): zero features contribute
nothing to the dot products, and padded key rows are masked to -inf before the
softmax. The backward pass recomputes through the jnp reference implementation
(custom_vjp), so training gradients are exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -1e30


def _flash_kernel(n_valid: int, block_k: int, num_k: int,
                  q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)

    # mask padded key rows (global key index >= n_valid)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_idx * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scr[:]  # (BQ, 1)
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_forward(
    q: jnp.ndarray,  # (B, N, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    b, n, d = q.shape
    assert d <= LANE, f"head dim {d} > {LANE} unsupported"

    nq_pad = -(-n // block_q) * block_q
    nk_pad = -(-n // block_k) * block_k
    n_pad = max(nq_pad, nk_pad)
    num_q = n_pad // block_q
    num_k = n_pad // block_k

    qp = _pad_to(_pad_to(q, LANE, 2), n_pad, 1)
    kp = _pad_to(_pad_to(k, LANE, 2), n_pad, 1)
    vp = _pad_to(_pad_to(v, LANE, 2), n_pad, 1)

    kernel = functools.partial(_flash_kernel, n, block_k, num_k)
    out = pl.pallas_call(
        kernel,
        grid=(b, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, q_, k_: (b_, k_, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, q_, k_: (b_, k_, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, LANE), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # batch and query blocks are independent; the key axis is the online-
            # softmax reduction and must run sequentially
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :d]


def _reference_attention(g, theta, phi):
    """Dense jnp reference (tests + small shapes only: materializes (HW)^2)."""
    scores = jnp.einsum("bqc,bkc->bqk", phi, theta, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(g.dtype)
    return jnp.einsum("bqk,bkc->bqc", attn, g, preferred_element_type=jnp.float32).astype(g.dtype)


@jax.custom_vjp
def flash_nonlocal_attention(g, theta, phi):
    """softmax(phi . theta^T) . g via the Pallas kernel.

    Backward: blockwise recompute (one query block of scores live at a time, like
    the forward) — the dense softmax VJP would materialize the full (HW)^2 matrix
    and OOM at stage-1 resolution.
    """
    return _flash_forward(phi, theta, g)


def _fwd(g, theta, phi):
    return _flash_forward(phi, theta, g), (g, theta, phi)


def _bwd(res, ct, block_q: int = 1024):
    g, theta, phi = res
    b, n, d = g.shape
    f32 = jnp.float32
    gf, tf, pf, ctf = (a.astype(f32) for a in (g, theta, phi, ct))

    num_blocks = -(-n // block_q)
    n_pad = num_blocks * block_q
    phi_p = _pad_to(pf, n_pad, 1).reshape(b, num_blocks, block_q, d).transpose(1, 0, 2, 3)
    ct_p = _pad_to(ctf, n_pad, 1).reshape(b, num_blocks, block_q, d).transpose(1, 0, 2, 3)
    # padded query rows: softmax over real keys is well-defined; their ct rows are
    # zero-padded so they contribute nothing to the dg/dtheta accumulators.

    # the (B, BQ, N) intermediates dominate HBM traffic; storing the softmax and
    # its cotangent in bf16 halves it (grads stay f32 in the accumulators)
    mat_dtype = jnp.bfloat16 if g.dtype == jnp.bfloat16 else f32

    def step(carry, inputs):
        dg_acc, dth_acc = carry
        phi_blk, ct_blk = inputs  # (B, BQ, D)
        s = jnp.einsum("bqc,bkc->bqk", phi_blk, tf, preferred_element_type=f32)
        a = jax.nn.softmax(s, axis=-1)  # (B, BQ, N)
        da = jnp.einsum("bqc,bkc->bqk", ct_blk, gf, preferred_element_type=f32)
        ds = (a * (da - jnp.sum(a * da, axis=-1, keepdims=True))).astype(mat_dtype)
        a = a.astype(mat_dtype)
        dphi_blk = jnp.einsum("bqk,bkc->bqc", ds, tf.astype(mat_dtype), preferred_element_type=f32)
        dg_acc = dg_acc + jnp.einsum(
            "bqk,bqc->bkc", a, ct_blk.astype(mat_dtype), preferred_element_type=f32
        )
        dth_acc = dth_acc + jnp.einsum(
            "bqk,bqc->bkc", ds, phi_blk.astype(mat_dtype), preferred_element_type=f32
        )
        return (dg_acc, dth_acc), dphi_blk

    (dg, dth), dphi_blocks = jax.lax.scan(
        step, (jnp.zeros_like(gf), jnp.zeros_like(tf)), (phi_p, ct_p)
    )
    dphi = dphi_blocks.transpose(1, 0, 2, 3).reshape(b, n_pad, d)[:, :n]
    return dg.astype(g.dtype), dth.astype(theta.dtype), dphi.astype(phi.dtype)


flash_nonlocal_attention.defvjp(_fwd, _bwd)


def flash_attention_available() -> bool:
    """Pallas TPU lowering requires an actual TPU backend."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
