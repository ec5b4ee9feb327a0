"""Corrected heads probe. round 2's probe_heads_slope let XLA hoist the four
non-carry levels out of the scan (its "both heads, 5 levels" slope printed
220 TF/s > the 197 peak — impossible), so the 15-vs-18.4 ms "anomaly" compared
5 in-graph levels against ~1 probed level. Here EVERY level input is
carry-dependent (pyr_i + c with a scalar c from the previous iteration), so
slopes measure what the production graph runs.

Variants probed: per-level cost split, grouped-conv merged towers (one
feature_group_count=2 conv call instead of separate cls/reg convs), and a
small-levels-only canvas pack (P4-P6 share one head call; the full 5-level
canvas lost end-to-end in round 2 because of the big-level packing overhead).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from frn_tpu.models.heads import ClassificationHead, RegressionHead, pack_pyramid, _unpack
from frn_tpu.models.layers import Conv
from frn_tpu.utils.cache import enable_compilation_cache

B = 8
SHAPES = [(120, 160), (60, 80), (30, 40), (15, 20), (8, 10)]


def sync(o):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1])


def slope(name, f, x0, flops=None, n1=2, n2=8, iters=8):
    """f: scalar-perturbation function c -> outputs; must make every op depend
    on c and return outputs whose mean feeds the next c."""
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
    print(f"{name:52s} {per * 1e3:8.3f} ms/op{extra}", flush=True)
    return per


def tower_flops(hw_list, heads=2):
    return 2 * B * sum(hw_list) * 9 * 256 * 256 * 4 * heads


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=256,
                                  prior=0.01, dtype=jnp.bfloat16)
    reg_head = RegressionHead(num_anchors=9, feature_size=256, dtype=jnp.bfloat16)
    pyr = [jnp.asarray(rng.normal(0, 1, (B, h, w, 256)), jnp.bfloat16)
           for h, w in SHAPES]
    cv = cls_head.init(jax.random.PRNGKey(0), pyr[0])
    rv = reg_head.init(jax.random.PRNGKey(1), pyr[0])
    c0 = jnp.float32(0.0)

    hw = [h * w for h, w in SHAPES]

    # --- production: both heads, all five levels, incl reshape+concat
    def prod(c):
        cls = jnp.concatenate(
            [cls_head.apply(cv, p + c.astype(p.dtype)) for p in pyr], axis=1)
        reg = jnp.concatenate(
            [reg_head.apply(rv, p + c.astype(p.dtype)) for p in pyr], axis=1)
        return cls, reg

    slope("PROD both heads 5 levels (+concat)", prod, c0, tower_flops(hw))

    # --- per-level split
    for i, (h, w) in enumerate(SHAPES):
        def one(c, i=i):
            p = pyr[i] + c.astype(pyr[i].dtype)
            return cls_head.apply(cv, p), reg_head.apply(rv, p)
        slope(f"level {i} ({h}x{w}) both heads", one, c0, tower_flops([hw[i]]))

    # --- small-levels canvas (P4, P5, P6 in one call)
    def small_canvas(c):
        feats = [pyr[i] + c.astype(pyr[i].dtype) for i in (2, 3, 4)]
        canvas, mask, shapes, origins = pack_pyramid(feats)
        reg_map = reg_head.apply(rv, canvas, mask=mask, raw=True)
        cls_map = cls_head.apply(cv, canvas, mask=mask, raw=True)
        reg = _unpack(reg_map, shapes, origins, 4)
        cls = _unpack(cls_map, shapes, origins, cls_map.shape[-1] // 9)
        return cls, reg

    slope("small levels P4-6 canvas both heads", small_canvas, c0,
          tower_flops(hw[2:]))

    # --- grouped-conv merged towers @P2 (one conv call per layer for both heads)
    class GroupedTowers(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=jnp.bfloat16, name="in")(x)  # 256 -> 512 (both towers)
            y = nn.relu(y)
            for i in range(3):
                y = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)],
                            feature_group_count=2, dtype=jnp.bfloat16,
                            name=f"g{i}")(y)
                y = nn.relu(y)
            return y

    gt = GroupedTowers()
    gv = gt.init(jax.random.PRNGKey(2), pyr[0])

    def grouped(c):
        return gt.apply(gv, pyr[0] + c.astype(pyr[0].dtype))

    slope("grouped towers @P2 (512ch, groups=2)", grouped, c0,
          tower_flops([hw[0]]))

    # --- towers only @P2 for reference (the 'pure conv' ceiling)
    class TowerOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(1, 5):
                x = nn.relu(Conv(256, 3, 1, 1, dtype=jnp.bfloat16,
                                 name=f"conv{i}")(x))
            return x

    tower = TowerOnly()
    tv = tower.init(jax.random.PRNGKey(3), pyr[0])

    def two_towers(c):
        p = pyr[0] + c.astype(pyr[0].dtype)
        return tower.apply(tv, p), tower.apply(tv, p)

    slope("2x tower only @P2", two_towers, c0, tower_flops([hw[0]]))




def probe_epilogue_attached():
    """The epilogue measured ~free in isolation (probe_epilogue.py) but PROD -
    per-level-sum = 3.3 ms: the cost only exists when the reshapes are attached
    to the conv outputs (layout assignment flows backward into the convs).
    Compare full head+epilogue variants."""
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=256,
                                  prior=0.01, dtype=jnp.bfloat16)
    reg_head = RegressionHead(num_anchors=9, feature_size=256, dtype=jnp.bfloat16)
    pyr = [jnp.asarray(rng.normal(0, 1, (B, h, w, 256)), jnp.bfloat16)
           for h, w in SHAPES]
    cv = cls_head.init(jax.random.PRNGKey(0), pyr[0])
    rv = reg_head.init(jax.random.PRNGKey(1), pyr[0])
    c0 = jnp.float32(0.0)
    A, C = 9, 3

    def raw_maps(c):
        outs = []
        for p in pyr:
            p = p + c.astype(p.dtype)
            outs.append(cls_head.apply(cv, p, raw=True))
            outs.append(reg_head.apply(rv, p, raw=True))
        return outs

    def chanlast(c):
        def t(m, last):
            b, h, w, _ = m.shape
            x = m.reshape(b, h, w, A, last)
            return x.transpose(0, 4, 1, 2, 3).reshape(b, last, -1)
        clss, regs = [], []
        for p in pyr:
            p = p + c.astype(p.dtype)
            clss.append(t(cls_head.apply(cv, p, raw=True), C))
            regs.append(t(reg_head.apply(rv, p, raw=True), 4))
        cls = jax.nn.sigmoid(jnp.concatenate(clss, axis=2).astype(jnp.float32))
        reg = jnp.concatenate(regs, axis=2).astype(jnp.float32)
        return cls, reg

    # NOTE: cls raw=True still applies sigmoid inside the head; for a pure
    # layout comparison that is fine (sigmoid measured ~0 either way)
    slope("PROD raw maps (no epilogue)", raw_maps, c0, tower_flops(hw_all()))
    slope("PROD chanlast (C,N) epilogue", chanlast, c0, tower_flops(hw_all()))


def hw_all():
    return [h * w for h, w in SHAPES]




def probe_fused_vs_module():
    """fused_dual_heads (grouped convs) vs apply_heads, full 5-level PROD incl.
    epilogue — bench measured the fused path ~2.5 img/s SLOWER end-to-end
    despite the grouped @P2 win; localize."""
    from frn_tpu.models.heads import apply_heads, fused_dual_heads

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=256,
                                  prior=0.01, dtype=jnp.bfloat16)
    reg_head = RegressionHead(num_anchors=9, feature_size=256, dtype=jnp.bfloat16)
    pyr = [jnp.asarray(rng.normal(0, 1, (B, h, w, 256)), jnp.bfloat16)
           for h, w in SHAPES]
    cv = cls_head.init(jax.random.PRNGKey(0), pyr[0])
    rv = reg_head.init(jax.random.PRNGKey(1), pyr[0])
    c0 = jnp.float32(0.0)
    hw = [h * w for h, w in SHAPES]

    def module_prod(c):
        feats = [p + c.astype(p.dtype) for p in pyr]
        return apply_heads(
            lambda f, **kw: cls_head.apply(cv, f, **kw),
            lambda f, **kw: reg_head.apply(rv, f, **kw), feats)

    def fused_prod(c):
        feats = [p + c.astype(p.dtype) for p in pyr]
        return fused_dual_heads(cv["params"], rv["params"], feats, 3, 9,
                                dtype=jnp.bfloat16)

    def fused_p2(c):
        return fused_dual_heads(cv["params"], rv["params"],
                                [pyr[0] + c.astype(pyr[0].dtype)], 3, 9,
                                dtype=jnp.bfloat16)

    def module_p2(c):
        f = pyr[0] + c.astype(pyr[0].dtype)
        return cls_head.apply(cv, f), reg_head.apply(rv, f)

    slope("PROD module path (5 lvls + epilogue)", module_prod, c0, tower_flops(hw))
    slope("PROD fused grouped (5 lvls + epilogue)", fused_prod, c0, tower_flops(hw))
    slope("P2 module (heads only)", module_p2, c0, tower_flops([hw[0]]))
    slope("P2 fused grouped", fused_p2, c0, tower_flops([hw[0]]))


if __name__ == "__main__":
    probe_fused_vs_module()
