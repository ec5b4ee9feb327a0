"""Backbone deep-dive on the real TPU: per-stage timing + conv roofline probes.

Answers round-2 perf question #1: the dual ResNet-50 backbones measure far above
their ~4 ms/b8 FLOP roofline — is it the stems (C=3/5 lane padding), a specific
stage, BN/relu fusion failure, or uniformly low conv efficiency?
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from frn_tpu.models.layers import Conv, FrozenBatchNorm, max_pool_3x3_s2
from frn_tpu.models.resnet import ResNetBackbone
from frn_tpu.utils.cache import enable_compilation_cache

ITERS = int(os.environ.get("FRN_PROF_ITERS", "20"))
B = int(os.environ.get("FRN_PROF_BATCH", "8"))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(name, fn, *args, flops=None, iters=ITERS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:46s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def conv_flops(b, h, w, cin, cout, k, stride=1):
    return 2 * b * (h // stride) * (w // stride) * cin * cout * k * k


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"batch={B} devices={jax.devices()}", flush=True)

    # --- conv roofline probes (bf16, NHWC) at backbone-relevant shapes
    probes = [
        ("3x3 256->64   @120x160", (B, 120, 160, 256), 64, 3, 1),
        ("3x3 64->64    @120x160", (B, 120, 160, 64), 64, 3, 1),
        ("1x1 64->256   @120x160", (B, 120, 160, 64), 256, 1, 1),
        ("1x1 256->64   @120x160", (B, 120, 160, 256), 64, 1, 1),
        ("3x3 128->128  @60x80  ", (B, 60, 80, 128), 128, 3, 1),
        ("3x3 256->256  @30x40  ", (B, 30, 40, 256), 256, 3, 1),
        ("3x3 512->512  @15x20  ", (B, 15, 20, 512), 512, 3, 1),
        ("7x7 3->64 s2  @480x640", (B, 480, 640, 3), 64, 7, 2),
        ("7x7 5->64 s2  @480x640", (B, 480, 640, 5), 64, 7, 2),
        ("3x3 256->256  @120x160", (B, 120, 160, 256), 256, 3, 1),  # head-tower shape
    ]
    for name, shape, cout, k, s in probes:
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)
        conv = Conv(cout, k, s, k // 2, use_bias=False, dtype=jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, x: conv.apply(v, x))
        fl = conv_flops(shape[0], shape[1], shape[2], shape[3], cout, k, s)
        timeit(f"conv {name}", f, v, x, flops=fl)

    # --- conv + frozenBN + relu fusion check (same 3x3 64->64)
    x = jnp.asarray(rng.normal(0, 1, (B, 120, 160, 64)), jnp.bfloat16)

    class ConvBnRelu(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(64, 3, 1, 1, use_bias=False, dtype=jnp.bfloat16)(x)
            x = FrozenBatchNorm(dtype=jnp.bfloat16)(x)
            return nn.relu(x)

    m = ConvBnRelu()
    v = m.init(jax.random.PRNGKey(0), x)
    timeit("conv3x3 64->64 + frozenBN + relu", jax.jit(lambda v, x: m.apply(v, x)),
           v, x, flops=conv_flops(B, 120, 160, 64, 64, 3))

    # --- stem alone (conv7x7 s2 + bn + relu + maxpool)
    class Stem(nn.Module):
        cin: int = 3

        @nn.compact
        def __call__(self, x):
            x = Conv(64, 7, 2, 3, use_bias=False, dtype=jnp.bfloat16)(x)
            x = FrozenBatchNorm(dtype=jnp.bfloat16)(x)
            return max_pool_3x3_s2(nn.relu(x))

    for cin in (3, 5):
        xs = jnp.asarray(rng.normal(0, 1, (B, 480, 640, cin)), jnp.bfloat16)
        stem = Stem(cin=cin)
        v = stem.init(jax.random.PRNGKey(0), xs)
        timeit(f"stem {cin}ch (7x7s2+bn+relu+maxpool)",
               jax.jit(lambda v, x: stem.apply(v, x)), v, xs,
               flops=conv_flops(B, 480, 640, cin, 64, 7, 2))

    # --- full backbone and per-stage-prefix timings
    bb = ResNetBackbone(layers=(3, 4, 6, 3), bottleneck=True, dtype=jnp.bfloat16)
    x3 = jnp.asarray(rng.normal(0, 1, (B, 480, 640, 3)), jnp.bfloat16)
    v = bb.init(jax.random.PRNGKey(0), x3)

    t_full = timeit("ResNet50 backbone (one, 3ch)",
                    jax.jit(lambda v, x: bb.apply(v, x)), v, x3)
    # FLOP model for reference
    print(f"    (FLOP roofline ~{25 * B / 1e3:.1f} TFLOP-> "
          f"{25 * B / 1e3 / 197 * 1e3:.2f} ms at peak)", flush=True)

    # stage-prefix timings: truncate layers
    for nstages, layers in ((1, (3,)), (2, (3, 4)), (3, (3, 4, 6))):
        bbp = ResNetBackbone(layers=layers, bottleneck=True, dtype=jnp.bfloat16)
        vp = bbp.init(jax.random.PRNGKey(0), x3)
        timeit(f"  prefix: stem+stage1..{nstages}",
               jax.jit(lambda v, x: bbp.apply(v, x)), vp, x3)


if __name__ == "__main__":
    main()
