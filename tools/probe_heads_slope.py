"""Slope-probe the head towers to localize the 108-vs-172 TFLOP/s gap.

The lone conv3x3+relu 256ch chain runs at 172 TFLOP/s (probe_conv_slope) but
both heads over 5 levels measure ~108. Candidates: the 27/36-channel output
convs (lane-padded 4.7x), the f32 sigmoid + reshape/concat epilogue, or the
small levels. Each stage is measured as a scan slope (relay-overhead-free).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.models.heads import ClassificationHead, RegressionHead
from frn_tpu.utils.cache import enable_compilation_cache

B = 8
SHAPES = [(120, 160), (60, 80), (30, 40), (15, 20), (8, 10)]


def sync(o):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1])


def slope(name, f, x0, flops=None, n1=2, n2=8, iters=8):
    def run(n):
        @jax.jit
        def g(x):
            def body(c, _):
                y = f(c)
                leaves = jax.tree_util.tree_leaves(y)
                bump = sum(jnp.mean(l).astype(c.dtype) for l in leaves)
                return c + bump, ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y

        o = g(x0)
        sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(x0)
        sync(o)
        return (time.perf_counter() - t0) / iters

    t1, t2 = run(n1), run(n2)
    per = (t2 - t1) / (n2 - n1)
    extra = f"  {flops / per / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:46s} {per * 1e3:8.3f} ms/op{extra}", flush=True)
    return per


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=256,
                                  prior=0.01, dtype=jnp.bfloat16)
    reg_head = RegressionHead(num_anchors=9, feature_size=256, dtype=jnp.bfloat16)
    p2 = jnp.asarray(rng.normal(0, 1, (B, 120, 160, 256)), jnp.bfloat16)
    cv = cls_head.init(jax.random.PRNGKey(0), p2)
    rv = reg_head.init(jax.random.PRNGKey(1), p2)

    hw2 = 120 * 160
    tower2 = 2 * B * hw2 * 9 * 256 * 256 * 4
    out2 = 2 * B * hw2 * 9 * 256 * 27

    slope("cls head @P2 (tower+out+sigmoid)",
          lambda x: cls_head.apply(cv, x), p2, flops=tower2 + out2)
    slope("reg head @P2", lambda x: reg_head.apply(rv, x), p2,
          flops=tower2 + 2 * B * hw2 * 9 * 256 * 36)

    # tower only (4 convs + relu, no output conv)
    from frn_tpu.models.layers import Conv
    from flax import linen as nn

    class TowerOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(1, 5):
                x = nn.relu(Conv(256, 3, 1, 1, dtype=jnp.bfloat16,
                                 name=f"conv{i}")(x))
            return x

    tower = TowerOnly()
    tv = tower.init(jax.random.PRNGKey(2), p2)
    slope("tower only @P2 (4x conv3x3+relu)",
          lambda x: tower.apply(tv, x), p2, flops=tower2)

    # output conv alone (27ch, lane-padded)
    outc = Conv(27, 3, 1, 1, dtype=jnp.bfloat16)
    ov = outc.init(jax.random.PRNGKey(3), p2)
    slope("output conv3x3 256->27 @P2",
          lambda x: outc.apply(ov, x), p2, flops=out2)

    # both heads across all levels (the production call, minus concat)
    pyr = [jnp.asarray(rng.normal(0, 1, (B, h, w, 256)), jnp.bfloat16)
           for h, w in SHAPES]

    def all_levels(x):
        outs = [cls_head.apply(cv, f if i else x) for i, f in enumerate(pyr)]
        outs += [reg_head.apply(rv, f if i else x) for i, f in enumerate(pyr)]
        return outs

    hw_all = sum(h * w for h, w in SHAPES)
    fl_all = 2 * 2 * B * hw_all * 9 * 256 * 256 * 4
    slope("both heads, 5 levels (no concat)", all_levels, p2, flops=fl_all)


if __name__ == "__main__":
    main()
