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
softmax.

Backward: the standard two-kernel flash decomposition (dQ kernel; dK/dV kernel)
driven by the forward's per-row logsumexp — a = exp(s - L), D = rowsum(dO*O),
ds = a*(dO V^T - D); dQ = ds K, dK = ds^T Q, dV = a^T dO. Scores stay in VMEM in
both directions (4.1x faster than the scan-recompute fallback, which remains the
CPU path).
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
LOG2E = 1.4426950408889634


def _flash_kernel(block_k: int, num_k: int, k_splits: int, d_ones: int,
                  q_splits: int, use_exp2: bool, exp_bf16: bool,
                  q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if q_splits > 1:
        # independent q-row groups unrolled in the body: group i's VPU exp has
        # no dependency on group j's MXU matmuls, giving the scheduler real
        # interleaving freedom (unlike k_splits, whose sub-blocks are chained
        # by the online-softmax recurrence)
        bq = q_ref.shape[1] // q_splits
        for i in range(q_splits):
            sl = slice(i * bq, (i + 1) * bq)
            _flash_q_group(block_k, num_k, k_splits, d_ones, use_exp2,
                           exp_bf16, k_idx, q_ref[0, sl, :], k_ref, v_ref,
                           o_ref, lse_ref, m_scr, acc_scr, sl)
        return

    _flash_q_group(block_k, num_k, k_splits, d_ones, use_exp2, exp_bf16, k_idx,
                   q_ref[0], k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr,
                   slice(None))


def _flash_q_group(block_k, num_k, k_splits, d_ones, use_exp2, exp_bf16, k_idx,
                   q, k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr, rows):
    # use_exp2: Q arrives pre-scaled by log2(e) (see _flash_forward), so the
    # softmax weights are 2^(s - m) — identical values, but exp2 is the VPU's
    # native transcendental (exp costs an extra multiply per element). All
    # running-max/correction algebra is domain-agnostic; lse is emitted in the
    # NATURAL log domain either way (finalize converts via ln2).
    exp_fn = jnp.exp2 if use_exp2 else jnp.exp

    # There is NO separate softmax-denominator accumulator: real V rows carry
    # 1.0 in free lane `d_ones` (see _flash_forward), so acc lane d_ones
    # accumulates rowsum(p) under the same alpha corrections as the outputs —
    # the l recurrence rides the (already padded) PV matmul lanes for free.
    #
    # k_splits > 1 unrolls the k block into sub-blocks inside the body (the
    # online-softmax recurrence at sub-block granularity, with per-row
    # corrections applied to the (BQ, D) pv products rather than the (BQ, BK)
    # p tiles). Measured on v5e at the stage-1 shape: SLOWER (ksplit2 17.8 ms
    # vs 12.5) — Mosaic does not overlap the VPU exp with the narrower MXU
    # sub-matmuls. Kept behind the static arg for future hardware; default 1.
    sub = block_k // k_splits
    m_prev0 = m_scr[rows, :]  # (BQ, 1) running max BEFORE this grid step
    m_run = m_prev0
    ps, vs, m_steps = [], [], []
    for i in range(k_splits):
        ks = k_ref[0, i * sub:(i + 1) * sub, :]  # (sub, D)
        vs.append(v_ref[0, i * sub:(i + 1) * sub, :])
        s = jax.lax.dot_general(
            q, ks, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, sub)
        # no in-kernel masking: padded key rows carry NEG_INF in the bias lane
        # (see _flash_forward), so their scores arrive as ~-1e30 from the MXU
        m_new = jnp.maximum(m_run, jnp.max(s, axis=1, keepdims=True))
        if exp_bf16:
            # exp on a bf16 tile: half the VPU vector width per op. The PV
            # matmul consumes p in bf16 anyway, so today's pipeline already
            # rounds p to bf16 AFTER an f32 exp; computing exp directly in
            # bf16 only adds the rounding of (s - m_new) <= 0: p error
            # ~|s-m|*2^-9 relative, i.e. <= 2% for weights >= e^-11 and
            # ~bf16-roundoff for the dominant near-max weights.
            ps.append(exp_fn((s - m_new).astype(jnp.bfloat16)))
        else:
            ps.append(exp_fn(s - m_new))
        m_steps.append(m_new)
        m_run = m_new

    m_final = m_steps[-1]
    acc = acc_scr[rows, :] * exp_fn(m_prev0 - m_final)
    for i in range(k_splits):
        pv = jax.lax.dot_general(
            ps[i].astype(vs[i].dtype), vs[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, D)
        if i < k_splits - 1:
            pv = pv * exp_fn(m_steps[i] - m_final)
        acc = acc + pv
    acc_scr[rows, :] = acc
    m_scr[rows, :] = m_final

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        l = acc[:, d_ones:d_ones + 1]  # rowsum(p) accumulated in-matmul
        o_ref[0, rows, :] = (acc / l).astype(o_ref.dtype)
        # per-row logsumexp in the NATURAL log domain regardless of exp_fn
        # (the backward kernels recompute s from UNSCALED q and use exp),
        # lane-broadcast: Pallas TPU blocks need a 128-divisible trailing dim
        ln2 = 0.6931471805599453
        lse = (m_final * ln2 + jnp.log(l)) if use_exp2 else (m_final + jnp.log(l))
        lse_ref[0, rows, :] = jnp.broadcast_to(lse, lse_ref[0, rows, :].shape)


def _pad_to(x: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_shapes(n: int, block_q: int, block_k: int):
    nq_pad = -(-n // block_q) * block_q
    nk_pad = -(-n // block_k) * block_k
    n_pad = max(nq_pad, nk_pad)
    return n_pad, n_pad // block_q, n_pad // block_k


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_q", "block_k", "k_splits", "q_splits", "vmem_limit_mb",
        "interpret", "return_lse", "use_exp2", "exp_bf16",
    ),
)
def _flash_forward(
    q: jnp.ndarray,  # (B, N, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k: int = 1024,
    k_splits: int = 1,
    q_splits: int = 1,
    vmem_limit_mb: int = 0,  # >0 raises Mosaic's scoped-VMEM budget (big blocks)
    interpret: bool = False,
    return_lse: bool = False,
    use_exp2: bool = False,
    exp_bf16: bool = False,
):
    # Block sizes measured on v5e at the stage-1 shape (tools/bench_flash.py):
    # (1024,1024) 12.3 ms vs (512,1024) 13.1 vs (512,512) 21.0; 2048 blocks
    # exceed the 16 MB scoped-VMEM limit. An explicitly cross-grid-step
    # pipelined variant (PV deferred one step via scratch) measured SLOWER
    # (15.4 ms); the in-body k_splits unroll replaces it.
    b, n, d = q.shape
    assert d < LANE, f"head dim {d} needs a free bias lane (< {LANE})"
    assert block_k % k_splits == 0
    n_pad, num_q, num_k = _pad_shapes(n, block_q, block_k)

    if use_exp2:
        # fold the natural->base-2 change of base into Q once (one bf16 mul
        # over N*D) so the kernel's per-score transcendental is the VPU-native
        # exp2; softmax weights are bit-comparable (2^(log2e*s) == e^s up to
        # the one extra rounding of the scaled Q)
        q = q * jnp.asarray(LOG2E, q.dtype)
    d_ones = d
    if n_pad == n:
        # exact-fit grid (block sizes divide N, see _pick_fwd_blocks): there
        # are NO padded key rows, so no masking lanes at all — only the lane
        # pad 32 -> 128 and the v ones lane, emitted in ONE pass per tensor.
        # The device trace (tools/trace_table.py, round 4) measured the padded
        # path's pad + .at[].set dynamic-update-slices at ~6 ms/step @ b16:
        # each bias-lane set is a full HBM pass over (B, N_pad, 128) bf16, and
        # the 4096 grid padded stage-1's 19,200 tokens to 20,480 (13.7% padded
        # score work inside the kernel). 19,200 = 5 x 3,840 fits exactly.
        qp = _pad_to(q, LANE, 2)
        kp = _pad_to(k, LANE, 2)
        vp = jnp.concatenate(
            [
                v,
                jnp.ones((b, n, 1), v.dtype),
                jnp.zeros((b, n, LANE - d - 1), v.dtype),
            ],
            axis=2,
        )
    else:
        qp = _pad_to(_pad_to(q, LANE, 2), n_pad, 1)
        kp = _pad_to(_pad_to(k, LANE, 2), n_pad, 1)
        vp = _pad_to(_pad_to(v, LANE, 2), n_pad, 1)
        # padded-key masking via a bias lane instead of an in-kernel iota+where:
        # every query carries 1.0 in lane d; padded key rows carry NEG_INF there
        # (real key rows keep 0). The MXU then produces s = -1e30 for padded keys
        # exactly, at zero per-step VPU cost. Padded QUERY rows need no handling —
        # their softmax is over real keys (finite) and their output is sliced off.
        qp = qp.at[:, :, d].set(jnp.asarray(1.0, qp.dtype))
        kp = kp.at[:, n:, d].set(jnp.asarray(NEG_INF, kp.dtype))
        # softmax denominator via the PV matmul: real V rows carry 1.0 in lane
        # d_ones, so acc[:, d_ones] == rowsum(p) under identical alpha corrections
        # (padded V rows stay 0 — their p is already 0 via the key bias lane)
        vp = vp.at[:, :n, d_ones].set(jnp.asarray(1.0, vp.dtype))

    assert block_q % q_splits == 0
    kernel = functools.partial(
        _flash_kernel, block_k, num_k, k_splits, d_ones, q_splits, use_exp2,
        exp_bf16,
    )
    out, lse = pl.pallas_call(
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
            pltpu.VMEM((block_q, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # batch and query blocks are independent; the key axis is the online-
            # softmax reduction and must run sequentially
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **(
                {"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
                if vmem_limit_mb
                else {}
            ),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    o = out[:, :n, :d]
    if return_lse:
        return o, lse[:, :n, 0]
    return o


# ----------------------------------------------------------------- backward


def _bwd_dq_kernel(num_k: int, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_scr):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0][:, 0:1]  # (BQ, 1)
    delta = delta_ref[0][:, 0:1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    a = jnp.exp(s - lse)  # padded key cols give exp(-lse) but K rows are zero -> no dQ effect
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (a * (dp - delta)).astype(k.dtype)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(num_q: int, k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k, v, q, do = k_ref[0], v_ref[0], q_ref[0], do_ref[0]
    lse = lse_ref[0][:, 0:1]  # (BQ, 1)
    delta = delta_ref[0][:, 0:1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    a = jnp.exp(s - lse)  # (BQ, BK); padded q rows have do=0/delta=0 -> contribute 0
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        a.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (a * (dp - delta)).astype(q.dtype)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(q_idx == num_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "vmem_limit_mb", "interpret"),
)
def _flash_backward(
    q, k, v, o, lse, do,
    # v5e sweep at the stage-1 shape (tools/bench_train.py): (1024,1024)
    # 33.1 ms vs (512,1024) 34.3, (1024,512) 34.4, (512,512) 39.7
    block_q: int = 1024,
    block_k: int = 1024,
    vmem_limit_mb: int = 0,
    interpret: bool = False,
):
    """Pallas flash-attention backward: returns (dq, dk, dv).

    Standard two-kernel decomposition with the forward's logsumexp: a = exp(s - L),
    ds = a * (dO V^T - D) with D = rowsum(dO * O); dQ = ds K, dK = ds^T Q,
    dV = a^T dO. Scores never leave VMEM.
    """
    b, n, d = q.shape
    n_pad, num_q, num_k = _pad_shapes(n, block_q, block_k)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (B, N)
    qp = _pad_to(_pad_to(q, LANE, 2), n_pad, 1)
    kp = _pad_to(_pad_to(k, LANE, 2), n_pad, 1)
    vp = _pad_to(_pad_to(v, LANE, 2), n_pad, 1)
    dop = _pad_to(_pad_to(do, LANE, 2), n_pad, 1)
    # lane-expanded row statistics (Pallas TPU trailing-dim constraint)
    lsep = jnp.broadcast_to(_pad_to(lse, n_pad, 1)[..., None], (b, n_pad, LANE))
    deltap = jnp.broadcast_to(_pad_to(delta, n_pad, 1)[..., None], (b, n_pad, LANE))

    q_spec = pl.BlockSpec((1, block_q, LANE), lambda b_, i, j: (b_, i, 0))
    q_spec_inner = pl.BlockSpec((1, block_q, LANE), lambda b_, i, j: (b_, j, 0))
    k_spec = pl.BlockSpec((1, block_k, LANE), lambda b_, i, j: (b_, j, 0))
    k_spec_outer = pl.BlockSpec((1, block_k, LANE), lambda b_, i, j: (b_, i, 0))
    row_spec = q_spec
    row_spec_inner = q_spec_inner
    sem = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        **(
            {"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
            if vmem_limit_mb
            else {}
        ),
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, num_k),
        grid=(b, num_q, num_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((1, block_q, LANE), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, LANE), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, LANE), jnp.float32)],
        compiler_params=sem,
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_q),
        grid=(b, num_k, num_q),
        in_specs=[k_spec_outer, k_spec_outer, q_spec_inner, q_spec_inner,
                  row_spec_inner, row_spec_inner],
        out_specs=(
            pl.BlockSpec((1, block_k, LANE), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, i, j: (b_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, LANE), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, LANE), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, LANE), jnp.float32),
            pltpu.VMEM((block_k, LANE), jnp.float32),
        ],
        compiler_params=sem,
        interpret=interpret,
    )(kp, vp, qp, dop, lsep, deltap)

    return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :d]


def _reference_attention(g, theta, phi):
    """Dense jnp reference (tests + small shapes only: materializes (HW)^2)."""
    scores = jnp.einsum("bqc,bkc->bqk", phi, theta, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(g.dtype)
    return jnp.einsum("bqk,bkc->bqc", attn, g, preferred_element_type=jnp.float32).astype(g.dtype)


def _min_pad_blocks(n: int, candidates):
    """Pick the (block, vmem_mb) minimizing ceil-padding of n; tie -> larger.

    Fallback for token counts with no exact-fit divisor (round 5, from the
    round-4 finding that padding + mask-lane work dominates the flash
    overhead): DDD17 stage-1's 5,655 tokens pad to 5,760 under a 1,920 block
    (1.9%) vs 6,144 under the old padded-1024 default (8.6% + more grid
    steps). Candidates are sublane-aligned (multiples of 8); larger blocks
    win ties (fewer grid steps, longer MXU streaks — the round-4 sweep's
    consistent direction at every measured N).
    """
    best = None
    for blk, mb in candidates:
        n_pad = -(-n // blk) * blk
        key = (n_pad, -blk)
        if best is None or key < best[0]:
            best = (key, (blk, blk, mb))
    return best[1]


def _single_block(n: int):
    """Round n up to the sublane (8) so ONE block covers all keys, if small.

    For sub-1,536-token stages (DDD17 stage-2: 1,452 -> 1,456, 0.3% pad vs
    41% under the padded-1024 grid) a single k block means num_k == 1: the
    online-softmax recurrence collapses to one step and the score tile
    (<= 1536^2 f32 = 9.4 MB) still fits VMEM under a modestly raised budget.
    """
    blk = -(-n // 8) * 8
    return blk if blk <= 1536 else None


def _pick_fwd_blocks(n: int, for_lse: bool = False):
    """(block_q, block_k, vmem_limit_mb) by sequence length.

    v5e sweep at the stage-1 shape (19,200 tokens): 4096x4096 blocks with a
    raised 120 MB scoped-VMEM budget (64 MB score tile) run 11.90 ms vs 12.23
    for 1024x1024 — fewer grid steps, longer MXU streaks. Small-N calls keep
    ~1024 blocks: a 4096 block would pad stage-2's 4,800 tokens by 70%.

    Exact-fit preference (round 4, from the device-trace attribution): a block
    size that DIVIDES n eliminates row padding, the q/k masking bias lanes
    (~6 ms/step of pad + dynamic-update-slice HBM passes @ b16), and the
    padded fraction of the score work itself (20,480^2 vs 19,200^2 = 12%).
    Candidates are sublane-aligned (multiples of 8) and within the measured
    sweet range; stage 1 (19,200) picks 3,840 (5x5 grid, same step count as
    the padded 4096 grid), stage 2 (4,800) picks 1,200 (4x4 vs 5x5 padded).
    When no divisor exists, fall back to the minimal-pad candidate
    (_min_pad_blocks) instead of the old always-pad-to-1024/4096 default —
    INFERENCE ONLY. `for_lse=True` (the train forward, which also emits the
    logsumexp for the Pallas backward) pins the no-divisor fallback to the
    padded 1024x1024/default-VMEM config: every raised-VMEM minimal-pad
    variant (fwd 1920@96 with lse, bwd 1920@96, single-block 1456@48) crashes
    the v5e worker at DDD17 geometry batch 16 in the full train graph
    (2026-08-21 bisect, /tmp/bisect_*.log protocol in PARITY.md) while b4/b8
    run fine and the all-1024 leg measures 95.45 ms — a Mosaic/runtime fault
    we route around, not a perf choice. Exact-fit divisors are unaffected
    (DSEC's 3840/1200 train grids are the measured round-4 win).
    """
    if n >= 16384:
        for blk in (4096, 3840, 3200, 2560, 2400, 1920):
            if n % blk == 0:
                return blk, blk, 120
        if for_lse:
            return 1024, 1024, 0
        return _min_pad_blocks(
            n,
            ((4096, 120), (3840, 120), (3200, 120), (2560, 96), (2400, 96),
             (1920, 96)),
        )
    for blk in (1200, 1024, 960, 800, 640):
        if n % blk == 0:
            return blk, blk, 0
    if for_lse:
        return 1024, 1024, 0
    one = _single_block(n)
    if one is not None:
        return one, one, 48
    return _min_pad_blocks(
        n,
        ((1920, 96), (1536, 48), (1440, 48), (1280, 24), (1200, 0),
         (1152, 0), (1024, 0), (960, 0), (800, 0), (640, 0)),
    )


@jax.custom_vjp
def flash_nonlocal_attention(g, theta, phi):
    """softmax(phi . theta^T) . g via the Pallas kernel.

    Backward: blockwise recompute (one query block of scores live at a time, like
    the forward) — the dense softmax VJP would materialize the full (HW)^2 matrix
    and OOM at stage-1 resolution.
    """
    bq, bk, mb = _pick_fwd_blocks(g.shape[1])
    return _flash_forward(phi, theta, g, block_q=bq, block_k=bk, vmem_limit_mb=mb)


def flash_nonlocal_attention_bf16exp(g, theta, phi):
    """Inference-only forward with bf16-exp softmax weights (no VJP defined).

    Gated by ModelConfig.flash_exp_bf16; numerics vs the f32-exp kernel differ
    only by bf16 roundoff on the softmax weights (tests/test_flash_attention.py).
    """
    bq, bk, mb = _pick_fwd_blocks(g.shape[1])
    return _flash_forward(
        phi, theta, g, block_q=bq, block_k=bk, vmem_limit_mb=mb, exp_bf16=True
    )


def _pick_bwd_blocks(n: int):
    """(block_q, block_k, vmem_limit_mb) for the backward kernels.

    v5e sweep at the stage-1 shape (19,200 tokens, tools/bench_train.py
    2026-08-19): exact-fit 1920x1920 under a raised 96 MB scoped-VMEM budget
    runs 31.61 ms vs 33.41 for the padded 1024x1024 default and 31.84 for
    2400x2400 — the first sweep's "exact-fit loses in bwd" result (1200: 33.63)
    was a VMEM-budget artifact: blocks >= 1920 OOM the default 16 MB budget,
    and the sub-1024 exact-fit candidates are too small to feed the MXU.
    Stage-2 (4,800 tokens): 960 exact-fit 4.55 ms ~ 1024 padded 4.60 (noise),
    but exact-fit also drops the 6 pad/slice HBM passes outside the kernel.

    No-divisor fallback is the padded 1024x1024/default-VMEM config: the
    raised-VMEM minimal-pad bwd variants crash the v5e worker at DDD17
    geometry batch 16 in the full train graph (see _pick_fwd_blocks docstring
    — 2026-08-21 bisect; bare-kernel probes of the same shapes pass, so this
    is an in-graph runtime fault, not a VMEM sizing error we can reason about).
    """
    if n >= 16384:
        for blk in (1920, 2400, 1600):
            if n % blk == 0:
                return blk, blk, 96
        return 1024, 1024, 0
    for blk in (960, 1024, 800, 1200):
        if n % blk == 0:
            return blk, blk, 0
    return 1024, 1024, 0


def _use_pallas_bwd() -> bool:
    return flash_attention_available()


def _fwd(g, theta, phi):
    bq, bk, mb = _pick_fwd_blocks(g.shape[1], for_lse=_use_pallas_bwd())
    if _use_pallas_bwd():
        o, lse = _flash_forward(
            phi, theta, g, block_q=bq, block_k=bk, vmem_limit_mb=mb,
            return_lse=True,
        )
        return o, (g, theta, phi, o, lse)
    o = _flash_forward(phi, theta, g, block_q=bq, block_k=bk, vmem_limit_mb=mb)
    return o, (g, theta, phi, None, None)


def _bwd(res, ct, block_q: int = 1024):
    g, theta, phi, o, lse = res
    if lse is not None:
        bq, bk, mb = _pick_bwd_blocks(g.shape[1])
        dphi, dtheta, dg = _flash_backward(
            phi, theta, g, o, lse, ct, block_q=bq, block_k=bk, vmem_limit_mb=mb
        )
        return dg, dtheta, dphi
    return _bwd_scan((g, theta, phi), ct, block_q=block_q)


def _bwd_scan(res, ct, block_q: int = 1024):
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


# ------------------------------------------------------- int8 serving kernel
#
# Opt-in inference mode (ModelConfig.attention_quant): the v5e MXU runs int8
# matmuls at 2x the bf16 rate, and PARITY.md's speed-of-light analysis shows
# the d=32 attention geometry is PADDED-FLOP bound on both matmuls — so int8
# halves the structural floor that no bf16 reformulation can escape.
#
# Quantization is DYNAMIC per (batch*direction) slice — no calibration data:
#   Qi = round(Q/sq * 127), sq = max|Q|  (same for K, and V in 'int8' mode)
#   S  = (Qi Ki^T) * c,  c = sq*sk/127^2   (exact dequant before the softmax)
# 'int8_qk' quantizes only the QK^T matmul (softmax weights and PV stay
# bf16-exact); 'int8' additionally quantizes P (round(p*127), exact at the
# row max since p<=1) and V. The softmax denominator rides lane d of V as in
# the bf16 kernel, carrying 127 so the P-quantization noise cancels between
# numerator and denominator (out = acc/acc_ones * 127*sv).
#
# Padded-key masking: int8 can't carry the NEG_INF bias lane, so the kernel
# masks by column iota (one broadcast add per tile, emitted only when the
# token count actually needs padding).


def _flash_int8_kernel(block_k, num_k, d_ones, n_real, full_int8, need_mask,
                       scale_ref, q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # sq*sk/127^2 dequant scale for this batch slice; the whole (B,) scale
    # vector rides SMEM as one block (Mosaic rejects sub-(8,128) blocked specs)
    c = scale_ref[pl.program_id(0)]
    s_int = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BQ, BK) int32 — MXU int8 path
    s = s_int.astype(jnp.float32) * c
    if need_mask:
        col = k_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1
        )
        s = s + jnp.where(col < n_real, 0.0, NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    if full_int8:
        # p <= 1 exactly (s <= m_new), so round(p*127) fits int8 with no clamp;
        # the dominant near-max weights quantize to 127 +- 0.5
        p_q = jnp.round(p * 127.0).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_q, v_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    alpha = jnp.exp(m_prev - m_new)
    acc = acc_scr[:] * alpha + pv
    acc_scr[:] = acc
    m_scr[:] = m_new

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        l = acc[:, d_ones:d_ones + 1]  # rowsum of the EFFECTIVE (quantized) p
        o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "block_q", "block_k", "vmem_limit_mb", "interpret"),
)
def _flash_forward_int8(
    q: jnp.ndarray,  # (B, N, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: str = "int8",  # 'int8' (QK^T + PV) | 'int8_qk' (QK^T only)
    block_q: int = 1024,
    block_k: int = 1024,
    vmem_limit_mb: int = 0,
    interpret: bool = False,
):
    b, n, d = q.shape
    assert d < LANE, f"head dim {d} needs a free denominator lane (< {LANE})"
    assert mode in ("int8", "int8_qk"), mode
    full = mode == "int8"
    n_pad, num_q, num_k = _pad_shapes(n, block_q, block_k)
    f32 = jnp.float32

    def quantize(x):
        s = jnp.max(jnp.abs(x.astype(f32)), axis=(1, 2), keepdims=True)
        s = jnp.maximum(s, jnp.asarray(1e-30, f32))
        xi = jnp.round(x.astype(f32) * (127.0 / s)).astype(jnp.int8)
        return xi, s[:, 0, 0]  # (B, N, D) int8, (B,)

    qi, sq = quantize(q)
    ki, sk = quantize(k)
    scales = (sq * sk * (1.0 / (127.0 * 127.0))).reshape(b)  # (B,) f32

    qp = _pad_to(_pad_to(qi, LANE, 2), n_pad, 1)
    kp = _pad_to(_pad_to(ki, LANE, 2), n_pad, 1)
    d_ones = d
    if full:
        vi, sv = quantize(v)
        vp = _pad_to(_pad_to(vi, LANE, 2), n_pad, 1)
        # denominator lane: 127 on real V rows so acc_ones = sum(P_int * 127);
        # the matching 127*sv dequant happens after the kernel
        vp = vp.at[:, :n, d_ones].set(jnp.asarray(127, jnp.int8))
    else:
        vp = _pad_to(_pad_to(v, LANE, 2), n_pad, 1)
        vp = vp.at[:, :n, d_ones].set(jnp.asarray(1.0, vp.dtype))

    kernel = functools.partial(
        _flash_int8_kernel, block_k, num_k, d_ones, n, full, n_pad > n,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, num_q, num_k),
        in_specs=[
            pl.BlockSpec((b,), lambda b_, q_, k_: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, q_, k_: (b_, k_, 0)),
            pl.BlockSpec((1, block_k, LANE), lambda b_, q_, k_: (b_, k_, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, LANE), lambda b_, q_, k_: (b_, q_, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, LANE), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), f32),
            pltpu.VMEM((block_q, LANE), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **(
                {"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
                if vmem_limit_mb
                else {}
            ),
        ),
        interpret=interpret,
    )(scales, qp, kp, vp)
    o = out[:, :n, :d]
    if full:
        # out = acc/acc_ones = sum(P_int V_int) / (127 sum(P_int)); with
        # V = V_int*sv/127, true o = sum(P_int V)/sum(P_int) = out * sv
        o = (o.astype(f32) * sv[:, None, None]).astype(q.dtype)
    return o


def quantized_attention_reference(g, theta, phi, mode: str = "int8"):
    """Dense jnp simulation of the int8 kernel's quantization algebra.

    The exactness oracle for `_flash_forward_int8` (bitwise-matching rounding
    when a single k block covers all keys) and the CPU stand-in for measuring
    detection agreement of the quantized serving mode without TPU hardware.
    """
    f32 = jnp.float32

    def quantize(x):
        s = jnp.maximum(jnp.max(jnp.abs(x.astype(f32)), axis=(1, 2), keepdims=True), 1e-30)
        return jnp.round(x.astype(f32) * (127.0 / s)).astype(jnp.int8), s

    qi, sq = quantize(phi)
    ki, sk = quantize(theta)
    s = jnp.einsum("bqc,bkc->bqk", qi.astype(jnp.int32), ki.astype(jnp.int32)).astype(f32)
    s = s * (sq * sk.transpose(0, 2, 1) * (1.0 / (127.0 * 127.0)))
    if mode == "int8_qk":
        attn = jax.nn.softmax(s, axis=-1).astype(g.dtype)
        return jnp.einsum(
            "bqk,bkc->bqc", attn, g, preferred_element_type=f32
        ).astype(g.dtype)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p_q = jnp.round(p * 127.0)  # int8 values, kept f32 for the einsum
    vi, sv = quantize(g)
    num = jnp.einsum("bqk,bkc->bqc", p_q, vi.astype(f32))
    den = jnp.sum(p_q, axis=-1, keepdims=True)
    return ((num / den) * (sv / 127.0)).astype(g.dtype)


def flash_nonlocal_attention_int8(g, theta, phi, mode: str = "int8"):
    """Inference-only int8 softmax(phi . theta^T) . g (no VJP defined).

    Gated by ModelConfig.attention_quant; exactness vs the dense simulation and
    agreement bounds vs the f32 path are pinned in tests/test_flash_attention.py.

    Blocks stay 1024x1024 at every N: the bf16 picker's 4096 blocks LOSE for
    int8 (v5e stage-1 probe 13.5/14.3 ms vs 11.5/12.1 at 1024 — the int8 score
    tile shifts the VMEM/grid-parallelism balance the other way).
    """
    return _flash_forward_int8(phi, theta, g, mode=mode)
