"""Probe the heads->NMS epilogue (reshape + concat + sigmoid) variants.

probe_heads2 found PROD(5 levels + concat) = 14.9 ms vs 11.6 ms for the bare
per-level head calls @ b8 — ~3.3 ms in the epilogue. Candidates:

  current   — f32 sigmoid on each cls map, reshape (B,h,w,A*C)->(B,hwA,C), concat
  bf16      — same shapes but concat in bf16, sigmoid deferred (monotone: NMS
              ranking on logits == on probabilities; sigmoid applied to the
              top-100 winners only)
  chanlast  — transpose to (B, C, hwA): anchor axis rides the 128 lanes in all
              downstream elementwise/threshold work instead of C=3
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.utils.cache import enable_compilation_cache

B = 8
SHAPES = [(120, 160), (60, 80), (30, 40), (15, 20), (8, 10)]
A, C = 9, 3


def sync(o):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1])


def slope(name, f, n1=2, n2=8, iters=8):
    def run(n):
        @jax.jit
        def g(c0):
            def body(c, _):
                outs = f(c)
                leaves = jax.tree_util.tree_leaves(outs)
                bump = sum(jnp.mean(l).astype(jnp.float32) for l in leaves)
                return bump * 1e-30, ()
            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c

        o = g(jnp.float32(0.0))
        sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(jnp.float32(0.0))
        sync(o)
        return (time.perf_counter() - t0) / iters

    t1, t2 = run(n1), run(n2)
    per = (t2 - t1) / (n2 - n1)
    print(f"{name:52s} {per * 1e3:8.3f} ms/op", flush=True)
    return per


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    cls_maps = [jnp.asarray(rng.normal(0, 1, (B, h, w, A * C)), jnp.bfloat16)
                for h, w in SHAPES]
    reg_maps = [jnp.asarray(rng.normal(0, 1, (B, h, w, A * 4)), jnp.bfloat16)
                for h, w in SHAPES]

    def cur(c):
        cls = jnp.concatenate(
            [jax.nn.sigmoid((m + c.astype(m.dtype)).astype(jnp.float32)
                            ).reshape(B, -1, C) for m in cls_maps], axis=1)
        reg = jnp.concatenate(
            [(m + c.astype(m.dtype)).astype(jnp.float32).reshape(B, -1, 4)
             for m in reg_maps], axis=1)
        return cls, reg

    def bf16_deferred(c):
        cls = jnp.concatenate(
            [(m + c.astype(m.dtype)).reshape(B, -1, C) for m in cls_maps], axis=1)
        reg = jnp.concatenate(
            [(m + c.astype(m.dtype)).reshape(B, -1, 4) for m in reg_maps], axis=1)
        return cls, reg

    def chanlast(c):
        # (B,h,w,A*C) -> (B,h,w,A,C) -> (B,C,h,w,A) -> (B,C,hwA)
        def t(m, last):
            b, h, w, _ = m.shape
            x = (m + c.astype(m.dtype)).reshape(b, h, w, A, last)
            return x.transpose(0, 4, 1, 2, 3).reshape(b, last, -1)
        cls = jnp.concatenate([t(m, C) for m in cls_maps], axis=2)
        reg = jnp.concatenate([t(m, 4) for m in reg_maps], axis=2)
        return cls, reg

    def chanlast_f32_sig(c):
        def t(m, last):
            b, h, w, _ = m.shape
            x = (m + c.astype(m.dtype)).reshape(b, h, w, A, last)
            return x.transpose(0, 4, 1, 2, 3).reshape(b, last, -1)
        cls = jax.nn.sigmoid(jnp.concatenate(
            [t(m, C) for m in cls_maps], axis=2).astype(jnp.float32))
        reg = jnp.concatenate([t(m, 4) for m in reg_maps], axis=2).astype(jnp.float32)
        return cls, reg

    slope("epilogue CURRENT (f32 sigmoid + (N,C) concat)", cur)
    slope("epilogue bf16 deferred-sigmoid (N,C)", bf16_deferred)
    slope("epilogue chanlast bf16 (C,N)", chanlast)
    slope("epilogue chanlast + f32 sigmoid after (C,N)", chanlast_f32_sig)


if __name__ == "__main__":
    main()
