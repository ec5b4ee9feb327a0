"""Slope-based conv/head probes: amortize the relay's per-call fixed overhead.

Times lax.scan(op, n) for two different n in one jit each; the slope
(t(n2)-t(n1))/(n2-n1) is the true per-op device cost, immune to dispatch
overhead. Single-op probes on the axon relay read a ~1.6-2.8 ms floor and are
useless (tools/profile_backbone.py round-2 finding).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.models.layers import Conv
from frn_tpu.utils.cache import enable_compilation_cache

B = 8


def _sync(x):
    np.asarray(jnp.ravel(x)[:1])


def slope(name, make_step, x0, flops, n1=4, n2=16, iters=8):
    """make_step: () -> f(x) -> x (same shape), applied n times via scan."""
    f = make_step()

    def run(n):
        @jax.jit
        def g(x):
            def body(x, _):
                return f(x), ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y

        out = g(x0)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(x0)
        _sync(out)
        return (time.perf_counter() - t0) / iters

    t1, t2 = run(n1), run(n2)
    per_op = (t2 - t1) / (n2 - n1)
    print(f"{name:44s} {per_op * 1e3:8.3f} ms/op  {flops / per_op / 1e12:6.1f} TFLOP/s"
          f"   (fixed ~{(t1 - n1 * per_op) * 1e3:.2f} ms)", flush=True)
    return per_op


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"batch={B}", flush=True)

    def conv_same(cin, cout, k):
        conv = Conv(cout, k, 1, k // 2, use_bias=False, dtype=jnp.bfloat16)
        x_init = jnp.zeros((B, 120, 160, cin), jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), x_init)
        return lambda x: conv.apply(v, x)

    # 3x3 256->256 @120x160 (head-tower shape)
    x = jnp.asarray(rng.normal(0, 1, (B, 120, 160, 256)), jnp.bfloat16)
    fl = 2 * B * 120 * 160 * 256 * 256 * 9
    slope("conv3x3 256->256 @120x160", lambda: conv_same(256, 256, 3), x, fl)

    # with relu between (head-tower reality)
    def conv_relu():
        f = conv_same(256, 256, 3)
        return lambda x: jax.nn.relu(f(x))
    slope("conv3x3+relu 256->256 @120x160", conv_relu, x, fl)

    # 3x3 64->64 (backbone stage-1 inner)
    x64 = jnp.asarray(rng.normal(0, 1, (B, 120, 160, 64)), jnp.bfloat16)
    fl64 = 2 * B * 120 * 160 * 64 * 64 * 9
    slope("conv3x3 64->64 @120x160", lambda: conv_same(64, 64, 3), x64, fl64)

    # 1x1 256->256 (fusion projections)
    fl1 = 2 * B * 120 * 160 * 256 * 256
    slope("conv1x1 256->256 @120x160", lambda: conv_same(256, 256, 1), x, fl1)

    # bottleneck block chain 256 -> 64 -> 64 -> 256 (stage-1 residual body)
    def bottleneck():
        c1 = conv_same(256, 64, 1)
        x1 = jnp.zeros((B, 120, 160, 64), jnp.bfloat16)
        conv2 = Conv(64, 3, 1, 1, use_bias=False, dtype=jnp.bfloat16)
        v2 = conv2.init(jax.random.PRNGKey(1), x1)
        conv3 = Conv(256, 1, 1, 0, use_bias=False, dtype=jnp.bfloat16)
        v3 = conv3.init(jax.random.PRNGKey(2), x1)
        def f(x):
            y = jax.nn.relu(c1(x))
            y = jax.nn.relu(conv2.apply(v2, y))
            return jax.nn.relu(conv3.apply(v3, y)) + x
        return f
    flb = 2 * B * 120 * 160 * (256 * 64 + 9 * 64 * 64 + 64 * 256)
    slope("bottleneck 256-64-64-256 @120x160", bottleneck, x, flb)

    # --- MXU ceilings: plain bf16 matmuls (f32 accum), K=2048 vs K=128.
    # K=128 is the flash QK contraction geometry (d=32 padded to one lane tile):
    # its ceiling bounds what any kernel scheduling work can reach.
    def matmul(m, k, n):
        w = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.bfloat16)
        def f(x):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # keep every output column live (a slice would let XLA shrink the
            # matmul); rowsum is cheap VPU work
            return (x + jnp.sum(y, axis=1, keepdims=True).astype(x.dtype)
                    ).astype(jnp.bfloat16)
        return f

    xm = jnp.asarray(rng.normal(0, 1, (8192, 2048)), jnp.bfloat16)
    slope("matmul 8192x2048x2048 (big K)", lambda: matmul(8192, 2048, 2048),
          xm, 2 * 8192 * 2048 * 2048)
    xs = jnp.asarray(rng.normal(0, 1, (8192, 128)), jnp.bfloat16)
    slope("matmul 8192x128x8192 (K=128, QK geometry)",
          lambda: matmul(8192, 128, 8192), xs, 2 * 8192 * 128 * 8192)


if __name__ == "__main__":
    main()
