"""Full-graph A/B of the eval fast-path ladder (round-3/4 perf levers).

Variants (cumulative where meaningful):
  base             round-3 default: dense decode, probs, XLA stem
  pooled           decode only the per-class top-k pool (core/nms.py)
  pooled_logits    + heads emit bf16 logits, sigmoid deferred past top-k
  pooled_chanlast  + classification emitted class-major (B, K, A)
  stem             Pallas implicit-GEMM stem (ops/stem.py), dense postprocess
  stem+chanlast    both levers together

Every number is the full production graph (depth-50 fusion, 480x640, bf16,
decode+NMS included) — isolated probe wins do not transfer on this stack
(CLAUDE.md), so this is the only measurement that decides defaults.

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/bench_fastpath.py [--batch 16] [--iters 20] [--exact]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--exact", action="store_true",
                    help="also measure exact-topk records per variant")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry + depth-18 on CPU: validates every "
                    "variant traces/runs before burning TPU time")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run (default: all)")
    args = ap.parse_args()

    import dataclasses as dc

    if args.smoke:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        args.batch, args.iters = 2, 1

    from frn_tpu.utils.cache import enable_compilation_cache
    if not args.smoke:
        enable_compilation_cache()
    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.models.detector import decode_detections, image_anchors, init_detector

    base = FrameworkConfig(
        geometry=dc.replace(DSEC, height=96, width=128) if args.smoke else DSEC,
        model=ModelConfig(variant="fusion", depth=18 if args.smoke else 50,
                          num_classes=3,
                          feature_size=32 if args.smoke else 256,
                          compute_dtype="bfloat16"),
    )
    model, variables = init_detector(base, jax.random.PRNGKey(0), batch_size=args.batch)
    anchors = jax.device_put(image_anchors(base))
    geo = base.geometry
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(0, 1, (args.batch, geo.height, geo.width, 3)), jnp.float32)
    event = jnp.asarray(
        rng.normal(0, 1, (args.batch, geo.height, geo.width, geo.event_channels)),
        jnp.float32,
    )

    def sync(o):
        np.asarray(o[0])

    def measure(cfg, eval_output):
        from frn_tpu.models.detector import FRNDetector

        m = FRNDetector(cfg) if cfg.model != base.model else model

        @jax.jit
        def infer(variables, anchors, rgb, event):
            cls, reg = m.apply(
                variables, rgb, event, train=False, eval_output=eval_output
            )
            return decode_detections(cls, reg, cfg, anchors=anchors)

        out = infer(variables, anchors, rgb, event)
        sync(out)
        out = infer(variables, anchors, rgb, event)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer(variables, anchors, rgb, event)
        sync(out)
        return args.batch * args.iters / (time.perf_counter() - t0)

    def cfg_for(postprocess="dense", stem=False, approx=True, exp_bf16=False,
                exact_pool="two_stage", fused_attn=False, reg36=False):
        return dataclasses.replace(
            base,
            model=dataclasses.replace(
                base.model, stem_kernel=stem, flash_exp_bf16=exp_bf16,
                fused_attention=fused_attn,
            ),
            eval=dataclasses.replace(
                base.eval, postprocess=postprocess, approx_topk=approx,
                exact_pool=exact_pool, reg_flat36=reg36,
            ),
        )

    outputs = {"dense": "probs", "pooled": "probs", "pooled_logits": "logits",
               "pooled_chanlast": "logits_chanlast"}
    variants = [
        ("base", "dense", False, False, False, False),
        ("pooled", "pooled", False, False, False, False),
        ("pooled_logits", "pooled_logits", False, False, False, False),
        ("pooled_chanlast", "pooled_chanlast", False, False, False, False),
        # reg36: + regression emitted as the free (B, HW, A*4) NHWC flatten;
        # the pooled decode gathers candidate delta slots (EvalConfig.reg_flat36)
        ("reg36", "pooled_chanlast", False, False, False, True),
        ("stem", "dense", True, False, False, False),
        ("exp_bf16", "dense", False, True, False, False),
        ("fused_attn", "pooled_chanlast", False, False, True, False),
        ("all", "pooled_chanlast", True, True, False, False),
    ]
    only = set(args.only.split(",")) if args.only else None
    for name, post, stem, ebf16, fattn, reg36 in variants:
        if only is not None and name not in only:
            continue
        fps = measure(
            cfg_for(post, stem, exp_bf16=ebf16, fused_attn=fattn, reg36=reg36),
            "logits_chanlast36" if reg36 else outputs[post],
        )
        print(f"{name:18s} approx     {fps:7.2f} img/s", flush=True)
        if args.exact:
            for pool in ("two_stage", "radix"):
                fps_e = measure(
                    cfg_for(post, stem, approx=False, exp_bf16=ebf16,
                            exact_pool=pool, fused_attn=fattn),
                    outputs[post])
                print(f"{name:18s} exact/{pool:9s} {fps_e:7.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
