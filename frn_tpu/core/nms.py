"""Fixed-size, on-device class-wise NMS.

The reference's eval branch loops per class in Python, boolean-masks to a dynamic box
set, and calls torchvision's native NMS kernel (retinanet/model.py:326-364) — all
host-driven and batch-1 only. TPU needs static shapes, so the same semantics are
re-expressed as: per-class top-k candidate pool -> dense IoU matrix -> sequential
greedy suppression (a kept box suppresses later overlapping boxes; suppressed boxes
suppress nothing — exactly torchvision.ops.nms) -> global top-k across classes.

Everything runs inside one XLA program; eval never round-trips to host per class.
Batched via vmap (fixes the reference's batch=1 assumption at model.py:341).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from frn_tpu.core.boxes import clip_boxes, decode_boxes, pairwise_iou
from frn_tpu.core.boxes import DEFAULT_STD


def greedy_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over boxes sorted by descending score.

    Exact torchvision-greedy semantics (a kept box suppresses later overlapping
    boxes; suppressed boxes suppress nothing), computed as a Gauss-Jacobi fixpoint
    instead of a T-step sequential scan: iterate
        keep <- valid & !any_i(i < j & keep[i] & iou[i,j] > t)
    until stable. After n sweeps every box whose suppression-chain depth is <= n is
    final, so the loop converges to the greedy solution in chain-depth iterations
    (typically 2-4 for detection boxes) of fully parallel (T,T) matrix ops —
    hundreds of times fewer sequential steps than the naive loop on TPU.

    Args:
      boxes: (T, 4), already sorted by score descending.
      scores: (T,), descending; entries <= 0 are padding and never kept.
    Returns:
      (T,) bool keep mask.
    """
    t = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)  # (T, T)
    later = jnp.arange(t)[None, :] > jnp.arange(t)[:, None]  # j strictly after i
    suppress_if_kept = ((iou > iou_threshold) & later).astype(jnp.float32)  # (T, T)
    valid = scores > 0.0

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < t)

    def body(state):
        keep, _, it = state
        suppressed = (keep.astype(jnp.float32) @ suppress_if_kept) > 0.0
        return valid & ~suppressed, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def exact_topk_two_stage(
    s: jnp.ndarray, k: int, num_blocks: int = 64, nonnegative: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Provably-exact top-k over a long vector via per-block top-k.

    Any element of the global top-k is by definition within the top-k of its own
    block, so top-k over each of `num_blocks` contiguous blocks followed by a
    top-k of the num_blocks*k block winners returns exactly the global top-k —
    while sorting only O(A log(A/nb) + nb*k log(nb*k)) elements instead of the
    full 230k-anchor sort that makes exact candidate pools 27% slower than
    approx_max_k. nb=64 measured fastest
    INSIDE the real nested-vmap consumer (tools/bench_nms_pool.py: 8.2 ms vs
    16.9 full-sort vs 3.8 approx per batch-16 postprocess; the bare vmapped-
    top-k probe preferred nb=256 — trust the in-context number).

    Tie semantics match jax.lax.top_k (ascending original index among equal
    values): blocks are contiguous index ranges emitted block-major, and within
    a block lax.top_k already orders ties by ascending index, so the stage-2
    top-k sees equal values in global ascending-index order and its own stable
    tie-break preserves it.

    nonnegative=True (caller guarantees every element >= 0.0, no -0.0 producers
    upstream of a `where(cond, s, 0.0)`) sorts the int32 bitcast instead — an
    order-isomorphic key for nonnegative IEEE floats — which measures another
    ~9% faster (integer comparators in the sort network). Values and tie order
    are bit-identical to the float path.
    """
    a = s.shape[0]
    if num_blocks <= 1 or num_blocks * k >= a:
        return jax.lax.top_k(s, k)
    if nonnegative and s.dtype == jnp.float32:
        si = jax.lax.bitcast_convert_type(s, jnp.int32)
        vals, idx = exact_topk_two_stage(si, k, num_blocks)
        return jax.lax.bitcast_convert_type(vals, jnp.float32), idx
    block_len = -(-a // num_blocks)
    pad = num_blocks * block_len - a
    pad_val = (
        jnp.iinfo(s.dtype).min if jnp.issubdtype(s.dtype, jnp.integer) else -jnp.inf
    )
    sp = jnp.pad(s, (0, pad), constant_values=pad_val)
    vals, idx = jax.lax.top_k(sp.reshape(num_blocks, block_len), k)  # (nb, k)
    base = jnp.arange(num_blocks, dtype=idx.dtype)[:, None] * block_len
    flat_idx = (idx + base).reshape(-1)
    top_vals, pos = jax.lax.top_k(vals.reshape(-1), k)
    return top_vals, flat_idx[pos]


def radix_select_topk(
    s: jnp.ndarray, k: int, chunk: int = 4, block_len: int = 512
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k — values, indices, and tie order identical to jax.lax.top_k —
    without sorting anything O(A)-sized.

    The CLAUDE.md round-4 "radix-select" lever: the per-class NMS candidate
    pool only needs the k-th largest score (a threshold) plus the elements
    above it; a sort computes a total order nobody reads. Three phases, all
    bandwidth-bound elementwise passes:

    1. *Threshold descent*: map scores to an order-isomorphic unsigned integer
       key (sign-flip trick; -0.0 canonicalized to +0.0 so key equality ==
       value equality, matching top_k's value ties). Walk the key's bits
       `chunk` at a time, high to low: one fused compare+reduce pass counts
       `count_ge(prefix | j << shift)` for all 2^chunk candidate prefixes at
       once, and the largest j with count >= k extends the prefix. After
       bits/chunk passes the prefix IS the exact k-th largest key T
       (invariant: count_ge(prefix) >= k and count_ge(prefix + 2^shift) < k).
    2. *Extraction*: elements with key > T are all in the top-k (< k of them,
       by maximality of T); ties at key == T fill the remainder in ascending
       index order — exactly lax.top_k's tie rule. Per-block counts of both
       masks + a tiny cumsum over blocks locate each output rank's block; one
       (k, block_len) row gather + a small intra-row cumsum finds its offset.
       No O(A) cumsum, no scatter.
    3. *Ordering*: lax.top_k over the k survivors only. The pool is laid out
       all->gt (ascending index) then ties (ascending index), so the small
       sort's stable tie-break reproduces the global order.

    bf16 inputs use a 16-bit key; f32 a 32-bit key. Other dtypes fall back to
    lax.top_k. NaNs are undefined behavior, as for lax.top_k itself.

    chunk trades passes against per-pass compare width (bits/chunk passes x
    2^chunk bounds): chunk=8 measured 132.3 img/s in the full-graph b16
    pooled_chanlast exact A/B (the 256-bound compare+count pass dominates);
    chunk=4 does 8x less compare work over 2x the passes.
    """
    a = s.shape[0]
    if k >= a:
        return jax.lax.top_k(s, k)
    if s.dtype == jnp.bfloat16:
        bits, udtype, sign = 16, jnp.uint16, 0x8000
    elif s.dtype == jnp.float32:
        bits, udtype, sign = 32, jnp.uint32, 0x80000000
    else:
        return jax.lax.top_k(s, k)
    assert bits % chunk == 0, (bits, chunk)
    sign = jnp.asarray(sign, udtype)

    def key_of(x):
        u = jax.lax.bitcast_convert_type(x, udtype)
        u = jnp.where(u == sign, jnp.zeros_like(u), u)  # -0.0 -> +0.0
        return jnp.where(u >= sign, ~u, u | sign)

    key = key_of(s)  # (a,) unsigned, descending order == descending score

    # Phase 1: bit-prefix descent to the exact k-th largest key.
    j = jnp.arange(1 << chunk, dtype=udtype)
    prefix = jnp.zeros((), udtype)
    for shift in range(bits - chunk, -1, -chunk):
        bounds = prefix | (j << shift)  # (2^chunk,)
        counts = jnp.sum(
            (key[:, None] >= bounds[None, :]).astype(jnp.int32), axis=0
        )  # (2^chunk,) — monotone non-increasing in j; counts[0] >= k invariant
        m = (jnp.sum((counts >= k).astype(jnp.int32)) - 1).astype(udtype)
        prefix = prefix | (m << shift)
    thr = prefix

    # Phase 2: extract the > thr elements and the first (k - m_gt) == thr ties.
    nb = -(-a // block_len)
    pad = nb * block_len - a
    keyp = jnp.pad(key, (0, pad)).reshape(nb, block_len)
    valid = (jnp.arange(nb * block_len) < a).reshape(nb, block_len)
    gt2 = (keyp > thr) & valid
    eq2 = (keyp == thr) & valid
    cgt = jnp.sum(gt2.astype(jnp.int32), axis=1)  # (nb,)
    ceq = jnp.sum(eq2.astype(jnp.int32), axis=1)
    igt = jnp.cumsum(cgt)
    ieq = jnp.cumsum(ceq)
    m_gt = igt[-1]

    r = jnp.arange(k, dtype=jnp.int32)
    is_gt = r < m_gt
    rank = jnp.where(is_gt, r, r - m_gt)  # 0-based rank within its stream
    blk = jnp.where(
        is_gt,
        jnp.searchsorted(igt, rank + 1, side="left"),
        jnp.searchsorted(ieq, rank + 1, side="left"),
    ).astype(jnp.int32)
    blk = jnp.minimum(blk, nb - 1)
    excl = jnp.where(is_gt, igt[blk] - cgt[blk], ieq[blk] - ceq[blk])
    local_rank = rank - excl  # 0-based within the block
    rows = jnp.where(is_gt[:, None], gt2[blk], eq2[blk])  # (k, block_len)
    pcs = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    loc = jnp.sum((pcs <= local_rank[:, None]).astype(jnp.int32), axis=1)
    idx = jnp.minimum(blk * block_len + loc, a - 1)

    # Phase 3: order the k survivors (gt ascending-index, then ties
    # ascending-index — top_k's stable tie-break preserves the global order).
    vals, order = jax.lax.top_k(s[idx], k)
    return vals, idx[order]


def _exact_pool_topk(s: jnp.ndarray, k: int, method: str, nonnegative: bool = False):
    """Dispatch the exact candidate-pool top-k (EvalConfig.exact_pool)."""
    if method == "radix":
        return radix_select_topk(s, k)
    return exact_topk_two_stage(s, k, nonnegative=nonnegative)


def class_aware_nms(
    boxes: jnp.ndarray,  # (A, 4) decoded+clipped boxes (shared across classes)
    scores: jnp.ndarray,  # (A, K) per-class sigmoid scores
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    per_class_topk: int = 400,
    max_detections: int = 100,
    approx_topk: bool = True,
    exact_pool: str = "two_stage",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class hard NMS then global top-k.

    Returns fixed-size (scores (M,), labels (M,) int32, boxes (M,4)); empty slots have
    score 0 and label -1. Matches model.py:340-364 + csv_eval.py:109-119 semantics
    (strict > threshold, per-class NMS at iou_threshold, global top max_detections).

    approx_topk uses the TPU-optimized approx_max_k for the per-class candidate
    pool (measured 3.5x faster than the exact sort, recall 0.997 at k=400 over
    230k anchors); only the tail of low-score pool entries can differ, which a
    400-pool -> top-100 pipeline never surfaces. Set False for exact semantics.
    """
    num_classes = scores.shape[1]
    t = per_class_topk

    def one_class(cls_scores: jnp.ndarray):
        s = jnp.where(cls_scores > score_threshold, cls_scores, 0.0)
        if approx_topk:
            vals, idx = jax.lax.approx_max_k(s, t, recall_target=0.99)
        else:
            # s is where(.. > thr, scores, 0.0) -> provably nonnegative, no -0.0
            vals, idx = _exact_pool_topk(s, t, exact_pool, nonnegative=True)
        b = boxes[idx]
        keep = greedy_nms_mask(b, vals, iou_threshold)
        return jnp.where(keep, vals, 0.0), b

    # vmap over classes: scores (A,K) -> (K,A)
    cls_scores, cls_boxes = jax.vmap(one_class)(scores.T)  # (K,T), (K,T,4)
    labels = jnp.broadcast_to(jnp.arange(num_classes, dtype=jnp.int32)[:, None], (num_classes, t))

    flat_scores = cls_scores.reshape(-1)
    flat_boxes = cls_boxes.reshape(-1, 4)
    flat_labels = labels.reshape(-1)

    k = min(max_detections, flat_scores.shape[0])
    top_vals, top_idx = jax.lax.top_k(flat_scores, k)
    out_scores = top_vals
    out_boxes = flat_boxes[top_idx]
    out_labels = jnp.where(top_vals > 0.0, flat_labels[top_idx], -1)
    if k < max_detections:
        pad = max_detections - k
        out_scores = jnp.pad(out_scores, (0, pad))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
    return out_scores, out_labels, out_boxes


def pooled_class_aware_nms(
    anchors: jnp.ndarray,  # (A, 4) f32 anchor corners
    deltas: jnp.ndarray,  # (A, 4) box deltas, or (HW, A_cell*4) flat36 maps
    scores: jnp.ndarray,  # (A, K) probabilities, (A, K) logits, or (K, A) logits
    image_shape: Tuple[int, int],
    std=DEFAULT_STD,
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    per_class_topk: int = 400,
    max_detections: int = 100,
    approx_topk: bool = True,
    logits: bool = False,
    class_major: bool = False,
    exact_pool: str = "two_stage",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """class_aware_nms that decodes ONLY the pooled candidates.

    The dense path decodes+clips all A anchors (230k at DSEC geometry) before
    NMS, but per class only the top-`per_class_topk` survive the score pool —
    ranking depends on scores alone, and decode is per-anchor elementwise, so
    gather-then-decode is bitwise identical to decode-then-gather while doing
    ~A/(K*T) times less decode work (and skipping the (A,4)-minor stack/slice
    relayouts over the full table).

    logits=True: `scores` are pre-sigmoid logits (any float dtype); the score
    threshold is applied in logit space (sigmoid is strictly monotone) and
    sigmoid runs only on the pooled (K, T) winners in f32. Ranking ties that
    f32 sigmoid saturation would create (sigma(x) == 1.0 for x > ~16.6) are
    resolved by the true logit instead — strictly more exact than the dense
    path, identical everywhere else.

    class_major=True: `scores` arrive as (K, A) — the layout the per-class
    vmap wants — skipping the (A, K) -> (K, A) narrow-minor transpose.
    """
    t = per_class_topk
    s_all = scores if class_major else scores.T  # (K, A)
    num_classes = s_all.shape[0]
    if logits:
        import math as _math

        lo, hi = -3.4e38, 3.4e38  # finite sentinels keep approx_max_k happy
        # log-odds of thresholds at/past the sigmoid's range have no finite
        # logit; clamp to the sentinels (thr <= 0 keeps everything, >= 1 nothing)
        if score_threshold <= 0.0:
            thr = lo
        elif score_threshold >= 1.0:
            thr = hi
        else:
            thr = float(_math.log(score_threshold / (1.0 - score_threshold)))
        thr = jnp.asarray(thr, s_all.dtype)
    else:
        thr = jnp.asarray(score_threshold, s_all.dtype)

    def one_class(cls_scores: jnp.ndarray):
        if logits:
            s = jnp.where(cls_scores > thr, cls_scores, jnp.asarray(lo, cls_scores.dtype))
            if approx_topk:
                vals, idx = jax.lax.approx_max_k(s, t, recall_target=0.99)
            else:
                vals, idx = _exact_pool_topk(s, t, exact_pool)
            pool_scores = jnp.where(
                vals > jnp.asarray(lo, vals.dtype),
                jax.nn.sigmoid(vals.astype(jnp.float32)),
                0.0,
            )
        else:
            s = jnp.where(cls_scores > thr, cls_scores, 0.0)
            if approx_topk:
                vals, idx = jax.lax.approx_max_k(s, t, recall_target=0.99)
            else:
                vals, idx = _exact_pool_topk(s, t, exact_pool, nonnegative=True)
            pool_scores = vals.astype(jnp.float32)
        if deltas.shape[-1] != 4:
            # flat36 regression ((HW, A_cell*4), the free NHWC flatten —
            # EvalConfig.reg_flat36): gather the candidate's cell row, then its
            # anchor's 4-delta slot. Global anchor order is (hw * A_cell + a)
            # per level, levels concatenated — identical to the rows layout's
            # reshape order, so idx//A_cell indexes the concatenated cell rows
            # directly. ~T*A_cell*4 gathered elements replace the full-table
            # (B, HWA, 4) relayout the device trace measured at 0.64 ms/step.
            a_cell = deltas.shape[-1] // 4
            rows = deltas[idx // a_cell]  # (T, A_cell*4)
            slot = (idx % a_cell)[:, None] * 4 + jnp.arange(4)[None, :]
            d = jnp.take_along_axis(rows, slot, axis=1)
        else:
            d = deltas[idx]
        b = decode_boxes(anchors[idx], d.astype(jnp.float32), std=std)
        b = clip_boxes(b, image_shape)
        keep = greedy_nms_mask(b, pool_scores, iou_threshold)
        return jnp.where(keep, pool_scores, 0.0), b

    cls_scores, cls_boxes = jax.vmap(one_class)(s_all)  # (K,T), (K,T,4)
    labels = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.int32)[:, None], (num_classes, t)
    )

    flat_scores = cls_scores.reshape(-1)
    flat_boxes = cls_boxes.reshape(-1, 4)
    flat_labels = labels.reshape(-1)

    k = min(max_detections, flat_scores.shape[0])
    top_vals, top_idx = jax.lax.top_k(flat_scores, k)
    out_scores = top_vals
    out_boxes = flat_boxes[top_idx]
    out_labels = jnp.where(top_vals > 0.0, flat_labels[top_idx], -1)
    if k < max_detections:
        pad = max_detections - k
        out_scores = jnp.pad(out_scores, (0, pad))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
    return out_scores, out_labels, out_boxes


def pooled_detection_postprocess(
    anchors: jnp.ndarray,  # (A, 4)
    deltas: jnp.ndarray,  # (B, A, 4)
    scores: jnp.ndarray,  # (B, A, K) or (B, K, A) per class_major
    image_shape: Tuple[int, int],
    std=DEFAULT_STD,
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    per_class_topk: int = 400,
    max_detections: int = 100,
    approx_topk: bool = True,
    logits: bool = False,
    class_major: bool = False,
    exact_pool: str = "two_stage",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmap of pooled_class_aware_nms over the batch: (B,M), (B,M), (B,M,4)."""
    return jax.vmap(
        lambda d, s: pooled_class_aware_nms(
            anchors, d, s, image_shape, std, score_threshold, iou_threshold,
            per_class_topk, max_detections, approx_topk, logits, class_major,
            exact_pool,
        )
    )(deltas, scores)


def batched_detection_postprocess(
    boxes: jnp.ndarray,  # (B, A, 4)
    scores: jnp.ndarray,  # (B, A, K)
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    per_class_topk: int = 400,
    max_detections: int = 100,
    approx_topk: bool = True,
    exact_pool: str = "two_stage",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmap of class_aware_nms over the batch: (B,M), (B,M), (B,M,4)."""
    return jax.vmap(
        lambda b, s: class_aware_nms(
            b, s, score_threshold, iou_threshold, per_class_topk, max_detections,
            approx_topk, exact_pool,
        )
    )(boxes, scores)
