"""A/B the NMS candidate-pool variants inside the REAL consumer
(batched_detection_postprocess: nested vmap batch x classes, threshold mask,
gather, greedy NMS) rather than a bare vmapped top-k — the two disagreed in
round 3 (bare probe said int-bitcast nb=256 fastest; the full graph measured
126.2 -> 118.7 img/s).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import frn_tpu.core.nms as nms
from frn_tpu.utils.cache import enable_compilation_cache

B, A, K = 16, 230220, 3
ITERS = 30


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def timeit(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt * 1e3:8.3f} ms/batch ({dt / B * 1e3:6.3f} ms/img)",
          flush=True)
    return dt


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    scores = np.zeros((B, A, K), np.float32)
    for b in range(B):
        for k in range(K):
            hot = rng.choice(A, 250, replace=False)
            scores[b, hot, k] = rng.uniform(0.05, 1.0, 250)
    x1 = rng.uniform(0, 600, (B, A, 1)).astype(np.float32)
    y1 = rng.uniform(0, 440, (B, A, 1)).astype(np.float32)
    boxes = np.concatenate(
        [x1, y1, x1 + rng.uniform(5, 40, (B, A, 1)), y1 + rng.uniform(5, 40, (B, A, 1))],
        axis=2).astype(np.float32)
    boxes_j = jnp.asarray(boxes)
    scores_j = jnp.asarray(scores)

    orig = nms.exact_topk_two_stage

    def post(approx):
        return jax.jit(functools.partial(
            nms.batched_detection_postprocess, approx_topk=approx))

    timeit("approx_max_k", post(True), boxes_j, scores_j)

    for nb, nonneg in ((64, False), (64, True), (128, True), (256, False),
                       (256, True), (32, False), (1, False)):
        def patched(s, k, num_blocks=None, nonnegative=False,
                    _nb=nb, _nn=nonneg):
            return orig(s, k, num_blocks=_nb, nonnegative=_nn)
        nms.exact_topk_two_stage = patched
        try:
            timeit(f"exact nb={nb} bitcast={nonneg}", post(False),
                   boxes_j, scores_j)
        finally:
            nms.exact_topk_two_stage = orig


if __name__ == "__main__":
    main()
