"""Kernel-level probe of the int8 flash attention at the stage-1 shape.

Fail-fast lowering check (does Mosaic take int8 dot_general on this chip?) +
kernel timing vs the bf16 kernel + on-device output agreement. Full-graph
numbers live in tools/bench_int8.py — this isolates the kernel.

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/probe_int8_flash.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.ops.flash_attention import _flash_forward, _flash_forward_int8
from frn_tpu.utils.cache import enable_compilation_cache


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, iters=20):
    try:
        out = fn()
        sync(out)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None, None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt, out


def main():
    enable_compilation_cache()
    B, N, D = 8, 19200, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    print(f"stage-1 shape: B={B} N={N} D={D}", flush=True)

    base_t, base = timeit("bf16 flash (bq4096, bk4096)",
                          lambda: _flash_forward(q, k, v, block_q=4096,
                                                 block_k=4096, vmem_limit_mb=120))
    for mode in ("int8_qk", "int8"):
        for bq, bk, mb in ((1024, 1024, 0), (4096, 4096, 120)):
            t, out = timeit(
                f"{mode} flash (bq{bq}, bk{bk})",
                lambda m=mode, a=bq, b_=bk, c=mb: _flash_forward_int8(
                    q, k, v, mode=m, block_q=a, block_k=b_, vmem_limit_mb=c),
            )
            if out is not None and base is not None:
                d = jnp.abs(out.astype(jnp.float32) - base.astype(jnp.float32))
                print(f"    vs bf16: mean|d| {float(jnp.mean(d)):.5f} "
                      f"max|d| {float(jnp.max(d)):.5f} "
                      f"(|o| mean {float(jnp.mean(jnp.abs(base.astype(jnp.float32)))):.4f})",
                      flush=True)
                if t and base_t:
                    print(f"    speedup vs bf16: {base_t / t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
