"""Microbenchmark the Pallas flash-attention kernel at fusion stage shapes.

Splits the cost into MXU (matmuls) vs VPU (softmax exp) by timing a kernel
variant with the exp replaced by a linear op, and sweeps block sizes. Drives
kernel-optimization decisions for the stage-1 (19,200-token, d=32) hot spot.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frn_tpu.ops.flash_attention import _flash_forward, _pad_shapes, _pad_to, LANE
from frn_tpu.utils.cache import enable_compilation_cache

NEG_INF = -1e30


def _kernel_noexp(n_valid, block_k, num_k,
                  q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr):
    """Same data flow as _flash_kernel but exp -> multiply (MXU cost only)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_idx * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)
    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = s * 1e-4  # <-- exp removed; everything else identical
    l_new = l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(k_idx == num_k - 1)
    def _fin():
        o_ref[0] = (acc_scr[:] / (l_scr[:] + 1.0)).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(m_scr[:] + l_scr[:], lse_ref[0].shape)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_noexp(q, k, v, block_q=512, block_k=1024):
    b, n, d = q.shape
    n_pad, num_q, num_k = _pad_shapes(n, block_q, block_k)
    qp = _pad_to(_pad_to(q, LANE, 2), n_pad, 1)
    kp = _pad_to(_pad_to(k, LANE, 2), n_pad, 1)
    vp = _pad_to(_pad_to(v, LANE, 2), n_pad, 1)
    kernel = functools.partial(_kernel_noexp, n, block_k, num_k)
    out, _ = pl.pallas_call(
        kernel,
        grid=(b, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, q_, k_: (b_, k_, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, q_, k_: (b_, k_, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
            pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, LANE), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qp, kp, vp)
    return out[:, :n, :d]


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, *args, iters=20):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    enable_compilation_cache()
    B, N, D = 8, 19200, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)

    print(f"stage-1 shape: B={B} N={N} D={D} bf16", flush=True)
    base = timeit("flash fwd (bq1024, bk1024, ksplit1)",
                  lambda: _flash_forward(q, k, v, k_splits=1))
    for qs in (2, 4):
        timeit(f"flash fwd (bq1024, bk1024, qsplit{qs})",
               lambda qs=qs: _flash_forward(q, k, v, q_splits=qs))
    timeit("flash fwd (bq2048, bk1024, qsplit2)",
           lambda: _flash_forward(q, k, v, block_q=2048, q_splits=2))
    timeit("flash fwd (bq2048, bk1024, qsplit4)",
           lambda: _flash_forward(q, k, v, block_q=2048, q_splits=4))
    timeit("flash fwd (bq512, bk1024)",
           lambda: _flash_forward(q, k, v, block_q=512, block_k=1024, k_splits=1))
    noexp = timeit("flash fwd NOEXP (bq512, bk1024)", lambda: flash_noexp(q, k, v))
    timeit("flash fwd NOEXP (bq1024, bk1024)",
           lambda: flash_noexp(q, k, v, block_q=1024, block_k=1024))

    # MXU ceiling: the two padded matmuls as plain XLA (batched, HBM-resident)
    n_pad = -(-N // 1024) * 1024
    qp = _pad_to(_pad_to(q, LANE, 2), n_pad, 1)
    kp = _pad_to(_pad_to(k, LANE, 2), n_pad, 1)

    @jax.jit
    def qk_only(qp, kp):
        return jnp.einsum("bqc,bkc->bqk", qp, kp,
                          preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    try:
        mm = timeit("XLA padded QK^T (materialized!)", qk_only, qp, kp)
    except Exception as e:  # OOM is fine, it's 2.9 GB
        print(f"XLA QK^T skipped: {type(e).__name__}")
        mm = None

    flops_padded = 2 * 2 * B * N * N * LANE
    flops_useful = 2 * 2 * B * N * N * D
    print(f"\npadded matmul FLOPs {flops_padded / 1e9:.1f} G, useful {flops_useful / 1e9:.1f} G")
    print(f"base kernel:  {flops_padded / base / 1e12:.1f} padded-TFLOP/s, "
          f"{flops_useful / base / 1e12:.1f} useful")
    print(f"noexp kernel: {flops_padded / noexp / 1e12:.1f} padded-TFLOP/s")
    print(f"exp overhead: {(base - noexp) * 1e3:.3f} ms "
          f"({(base - noexp) / base * 100:.0f}% of kernel time); "
          f"exps/s {B * N * N / (base - noexp) / 1e9:.2f} G" if base > noexp else "")


if __name__ == "__main__":
    main()
