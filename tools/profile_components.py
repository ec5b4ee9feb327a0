"""Break down single-chip inference time per component.

Times partial programs (backbones / fusion / FPN+heads / NMS) at DSEC geometry to
direct kernel-optimization work. Synchronization via host fetch (the axon relay's
block_until_ready is a no-op).
"""

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
from frn_tpu.models.fusion import REFusion
from frn_tpu.models.resnet import ResNetBackbone

BATCH = 4
ITERS = 10
DTYPE = "bfloat16"


def _sync(out):
    # fetch ONE element (device-side slice first) — fetching the whole array
    # would time the relay transfer, not the compute
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt * 1e3:8.2f} ms/call  {BATCH / dt:8.1f} img/s")
    return dt


def main():
    cfg = FrameworkConfig(
        geometry=DSEC,
        model=ModelConfig(variant="fusion", depth=50, num_classes=3, compute_dtype=DTYPE),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), batch_size=BATCH)
    anchors = jax.device_put(image_anchors(cfg))
    rng = np.random.default_rng(0)
    geo = cfg.geometry
    rgb = jnp.asarray(rng.normal(0, 1, (BATCH, geo.height, geo.width, 3)), jnp.float32)
    event = jnp.asarray(rng.normal(0, 1, (BATCH, geo.height, geo.width, 5)), jnp.float32)

    # full model
    @jax.jit
    def full(v, a, rgb, event):
        cls, reg = model.apply(v, rgb, event, train=False,
                               eval_output=eval_output_for(cfg))
        return decode_detections(cls, reg, cfg, anchors=a)

    @jax.jit
    def fwd_only(v, rgb, event):
        return model.apply(v, rgb, event, train=False)

    t_full = timeit("full (fwd+decode+nms)", full, variables, anchors, rgb, event)
    t_fwd = timeit("forward only", fwd_only, variables, rgb, event)

    # single backbone
    bb = ResNetBackbone(layers=(3, 4, 6, 3), bottleneck=True, dtype=jnp.bfloat16)
    bbv = bb.init(jax.random.PRNGKey(0), rgb.astype(jnp.bfloat16))

    @jax.jit
    def backbone(v, x):
        return bb.apply(v, x.astype(jnp.bfloat16))

    t_bb = timeit("one resnet50 backbone", backbone, bbv, rgb)

    # one fusion stage at stage-1 resolution (the attention hot spot)
    c1 = jnp.asarray(rng.normal(0, 1, (BATCH, 120, 160, 256)), jnp.bfloat16)
    fus = REFusion(channels=256, chunk=cfg.model.attention_chunk, dtype=jnp.bfloat16)
    fv = fus.init(jax.random.PRNGKey(0), c1, c1)

    @jax.jit
    def fusion1(v, a, b):
        return fus.apply(v, a, b)

    t_f1 = timeit("REFusion stage1 (120x160)", fusion1, fv, c1, c1)

    # stage-2
    c2 = jnp.asarray(rng.normal(0, 1, (BATCH, 60, 80, 512)), jnp.bfloat16)
    fus2 = REFusion(channels=512, chunk=cfg.model.attention_chunk, dtype=jnp.bfloat16)
    fv2 = fus2.init(jax.random.PRNGKey(0), c2, c2)

    @jax.jit
    def fusion2(v, a, b):
        return fus2.apply(v, a, b)

    t_f2 = timeit("REFusion stage2 (60x80)", fusion2, fv2, c2, c2)

    # nms alone (production postprocess: pooled_chanlast takes (B, K, A) logits)
    if cfg.eval.postprocess == "pooled_chanlast":
        cls_in = jnp.asarray(
            rng.normal(-4, 2, (BATCH, 3, 230220)), jnp.bfloat16
        )
    else:
        cls_in = jnp.asarray(rng.uniform(0, 0.2, (BATCH, 230220, 3)), jnp.float32)
    regs = jnp.asarray(rng.normal(0, 0.5, (BATCH, 230220, 4)), jnp.float32)

    @jax.jit
    def nms_only(a, c, r):
        return decode_detections(c, r, cfg, anchors=a)

    t_nms = timeit("decode+nms only", nms_only, anchors, cls_in, regs)

    print(f"\nestimates: 2 backbones {2 * t_bb * 1e3:.1f} ms, "
          f"fusion total ~{(t_f1 + t_f2) * 1e3 * 1.1:.1f} ms, "
          f"heads+fpn ~{(t_fwd - 2 * t_bb - t_f1 - t_f2) * 1e3:.1f} ms, "
          f"nms {t_nms * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
