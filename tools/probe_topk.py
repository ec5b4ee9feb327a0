"""Sweep the exact-top-k block count against approx_max_k and the full sort.

The NMS candidate pool is 48 vmapped top-k(230220 -> 400) calls per batch-16
step (16 images x 3 classes). bench r3 start: approx 138.2 img/s, two-stage
exact (nb=64) 126.2 — find the nb (or recursion depth) that closes the gap.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.core.nms import exact_topk_two_stage
from frn_tpu.utils.cache import enable_compilation_cache

N = 48          # batch 16 x 3 classes
A = 230220
K = 400


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def slope(name, f, x0, n1=2, n2=8, iters=8):
    def run(n):
        @jax.jit
        def g(x):
            def body(c, _):
                v, i = f(x + c)
                # data-dependent, non-foldable carry (x*0 could be simplified
                # away; *1e-30 cannot) that keeps BOTH outputs live so the
                # index gather isn't dead-code-eliminated
                bump = (jnp.mean(v) + jnp.min(i).astype(jnp.float32)) * 1e-30
                return c + bump, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        o = g(x0)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(x0)
        _sync(o)
        return (time.perf_counter() - t0) / iters

    t1, t2 = run(n1), run(n2)
    per = (t2 - t1) / (n2 - n1)
    print(f"{name:44s} {per * 1e3:8.3f} ms/call ({per / 16 * 1e3:6.3f} ms/img)",
          flush=True)
    return per


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    # realistic pool input: threshold-masked scores, ~250 hot entries per row
    s = np.zeros((N, A), np.float32)
    for r in range(N):
        hot = rng.choice(A, 250, replace=False)
        s[r, hot] = rng.uniform(0.05, 1.0, 250)
    x0 = jnp.asarray(s)

    slope("approx_max_k",
          lambda x: jax.vmap(lambda v: jax.lax.approx_max_k(v, K, recall_target=0.99))(x), x0)
    slope("full lax.top_k",
          lambda x: jax.vmap(lambda v: jax.lax.top_k(v, K))(x), x0)
    for nb in (16, 32, 64, 128, 256, 512):
        slope(f"two-stage nb={nb}",
              lambda x, nb=nb: jax.vmap(
                  lambda v: exact_topk_two_stage(v, K, num_blocks=nb))(x), x0)

    # three-stage: blocks of ~1800 (nb=128), then the 51200 winners again in 16
    def three_stage(v):
        v1, i1 = exact_topk_two_stage(v, K, num_blocks=128)
        return v1, i1
    # (two_stage already recurses stage-2 through top_k; emulate a 3-stage by
    # two_stage over the 128*K winners)
    def exact3(v):
        a = v.shape[0]
        nb = 128
        bl = -(-a // nb)
        sp = jnp.pad(v, (0, nb * bl - a), constant_values=-jnp.inf)
        vals, idx = jax.lax.top_k(sp.reshape(nb, bl), K)
        base = jnp.arange(nb, dtype=idx.dtype)[:, None] * bl
        flat_idx = (idx + base).reshape(-1)
        tv, pos = exact_topk_two_stage(vals.reshape(-1), K, num_blocks=16)
        return tv, flat_idx[pos]

    slope("three-stage nb=128 then 16",
          lambda x: jax.vmap(exact3)(x), x0)




def probe_bitcast():
    """Nonnegative f32 bitcast to int32 is order-isomorphic; integer sort may
    beat float sort in the TopK comparator."""
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    s = np.zeros((N, A), np.float32)
    for r in range(N):
        hot = rng.choice(A, 250, replace=False)
        s[r, hot] = rng.uniform(0.05, 1.0, 250)
    x0 = jnp.asarray(s)

    def two_stage_int(v, nb):
        vi = jax.lax.bitcast_convert_type(v, jnp.int32)
        a = vi.shape[0]
        bl = -(-a // nb)
        sp = jnp.pad(vi, (0, nb * bl - a), constant_values=jnp.iinfo(jnp.int32).min)
        vals, idx = jax.lax.top_k(sp.reshape(nb, bl), K)
        base = jnp.arange(nb, dtype=idx.dtype)[:, None] * bl
        flat_idx = (idx + base).reshape(-1)
        tv, pos = jax.lax.top_k(vals.reshape(-1), K)
        return jax.lax.bitcast_convert_type(tv, jnp.float32), flat_idx[pos]

    for nb in (64, 128, 256):
        slope(f"two-stage INT bitcast nb={nb}",
              lambda x, nb=nb: jax.vmap(lambda v: two_stage_int(v, nb))(x), x0)


if __name__ == "__main__":
    probe_bitcast()
