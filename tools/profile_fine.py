"""Fine-grained single-chip profile: heads / FPN / fusion-conv split + batch sweep.

Complements tools/profile_components.py with the questions round 2 cares about:
are the shared RetinaNet heads MXU-bound (nothing to win) or not, how much of
REFusion is non-attention overhead, and how throughput scales with batch.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
from frn_tpu.models.detector import (
    decode_detections,
    eval_output_for,
    image_anchors,
    init_detector,
)
from frn_tpu.models.fpn import PyramidFeatures
from frn_tpu.models.heads import ClassificationHead, RegressionHead, apply_heads
from frn_tpu.ops.flash_attention import _flash_forward
from frn_tpu.utils.cache import enable_compilation_cache

ITERS = int(os.environ.get("FRN_PROF_ITERS", "10"))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(name, fn, *args, iters=ITERS, work_imgs=None):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {work_imgs / dt:8.1f} img/s" if work_imgs else ""
    print(f"{name:42s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def pyramid_shapes(batch, h=480, w=640, feat=256):
    return [
        (batch, h // s, w // s, feat) for s in (4, 8, 16, 32, 64)
    ]


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B = 8

    cfg = FrameworkConfig(
        geometry=DSEC,
        model=ModelConfig(variant="fusion", depth=50, num_classes=3,
                          compute_dtype="bfloat16"),
    )

    # --- heads alone over a random pyramid
    pyr = [jnp.asarray(rng.normal(0, 1, s), jnp.bfloat16) for s in pyramid_shapes(B)]
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=256,
                                  prior=0.01, dtype=jnp.bfloat16)
    reg_head = RegressionHead(num_anchors=9, feature_size=256, dtype=jnp.bfloat16)
    cv = cls_head.init(jax.random.PRNGKey(0), pyr[0])
    rv = reg_head.init(jax.random.PRNGKey(1), pyr[0])

    from frn_tpu.models.heads import apply_heads

    @jax.jit
    def heads_all(cv, rv, pyr):
        cls = jnp.concatenate(
            [cls_head.apply(cv, p).astype(jnp.float32) for p in pyr], axis=1)
        reg = jnp.concatenate(
            [reg_head.apply(rv, p).astype(jnp.float32) for p in pyr], axis=1)
        return cls, reg

    @jax.jit
    def heads_packed(cv, rv, pyr):
        return apply_heads(
            lambda f, **kw: cls_head.apply(cv, f, **kw),
            lambda f, **kw: reg_head.apply(rv, f, **kw),
            pyr, packed=True,
        )

    t = timeit("both heads, 5 levels", heads_all, cv, rv, pyr, work_imgs=B)
    timeit("both heads, 5 levels PACKED", heads_packed, cv, rv, pyr, work_imgs=B)
    # useful FLOPs: per level, 2 heads x (4 towers + 1 out) convs 3x3 256ch
    hw_sum = sum(s[1] * s[2] for s in pyramid_shapes(B))
    tower = 4 * (9 * 256 * 256 * 2)
    out_c = 9 * 256 * (9 * 3) * 2 + 9 * 256 * 36 * 2
    flops = B * hw_sum * (2 * tower) + B * hw_sum * out_c
    print(f"    heads ~{flops / 1e9:.0f} GFLOP -> {flops / t / 1e12:.1f} TFLOP/s")

    @jax.jit
    def heads_p2(cv, rv, p):
        return cls_head.apply(cv, p), reg_head.apply(rv, p)

    timeit("both heads, P2 only", heads_p2, cv, rv, pyr[0])

    # --- FPN alone
    cs = [jnp.asarray(rng.normal(0, 1, (B, 480 // s, 640 // s, c)), jnp.bfloat16)
          for s, c in ((4, 512), (8, 1024), (16, 2048), (32, 4096))]
    fpn = PyramidFeatures(feature_size=256, upsample=cfg.geometry.fpn_upsample,
                          dtype=jnp.bfloat16)
    fv = fpn.init(jax.random.PRNGKey(2), cs)
    timeit("fpn alone", jax.jit(lambda v, x: fpn.apply(v, x)), fv, cs)

    # --- stage-1 fusion: total vs flash-only
    from frn_tpu.models.fusion import REFusion

    c1 = jnp.asarray(rng.normal(0, 1, (B, 120, 160, 256)), jnp.bfloat16)
    fus = REFusion(channels=256, chunk=1024, dtype=jnp.bfloat16)
    fvv = fus.init(jax.random.PRNGKey(3), c1, c1)
    t_fus = timeit("REFusion stage1 total (b8)", jax.jit(lambda v, a, b: fus.apply(v, a, b)), fvv, c1, c1)
    q = jnp.asarray(rng.normal(0, 1, (B, 19200, 32)), jnp.bfloat16)
    t_fl = timeit("flash fwd stage1 (b8, one direction)", lambda: _flash_forward(q, q, q))
    print(f"    non-attention overhead: {(t_fus - 2 * t_fl) * 1e3:.2f} ms")

    # --- full model batch sweep
    for batch in (8, 16):
        model, variables = init_detector(cfg, jax.random.PRNGKey(0), batch_size=batch)
        anchors = jax.device_put(image_anchors(cfg))

        @jax.jit
        def infer(v, a, rgb, event):
            c, r = model.apply(v, rgb, event, train=False,
                               eval_output=eval_output_for(cfg))
            return decode_detections(c, r, cfg, anchors=a)

        rgb = jnp.asarray(rng.normal(0, 1, (batch, 480, 640, 3)), jnp.float32)
        event = jnp.asarray(rng.normal(0, 1, (batch, 480, 640, 5)), jnp.float32)
        timeit(f"full model b{batch}", infer, variables, anchors, rgb, event,
               work_imgs=batch)


if __name__ == "__main__":
    main()
