"""A/B the flash forward's exp vs exp2 (log2e folded into Q) at stage shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.ops.flash_attention import _flash_forward, _pick_fwd_blocks
from frn_tpu.utils.cache import enable_compilation_cache


def _sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for b, n, d, label in ((8, 19200, 32, "stage1 b8"), (16, 19200, 32, "stage1 b16"),
                           (16, 4800, 64, "stage2 b16")):
        q = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.bfloat16)
        bq, bk, mb = _pick_fwd_blocks(n)
        timeit(f"{label} exp   (bq={bq})", _flash_forward, q, k, v,
               block_q=bq, block_k=bk, vmem_limit_mb=mb)
        timeit(f"{label} exp2  (bq={bq})", _flash_forward, q, k, v,
               block_q=bq, block_k=bk, vmem_limit_mb=mb, use_exp2=True)
        timeit(f"{label} exp-bf16 (bq={bq})", _flash_forward, q, k, v,
               block_q=bq, block_k=bk, vmem_limit_mb=mb, exp_bf16=True)


if __name__ == "__main__":
    main()
