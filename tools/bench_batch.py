"""Batch-size sweep of the production inference graph at the current defaults.

The b16 optimum was established with the dense postprocess (round 2: b8 126.9,
b16 135.9, b32 132.0); the pooled_chanlast default changes the epilogue cost
profile, so the sweep must be re-measured. Full graph, approx pool, one chip.

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/bench_batch.py [--batches 8,16,24,32] [--iters 20]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,24,32")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--exact", action="store_true")
    args = ap.parse_args()

    from frn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.models.detector import (
        decode_detections,
        eval_output_for,
        image_anchors,
        init_detector,
    )

    cfg = FrameworkConfig(
        geometry=DSEC,
        model=ModelConfig(variant="fusion", depth=50, num_classes=3,
                          compute_dtype="bfloat16"),
    )
    if args.exact:
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, approx_topk=False)
        )
    eval_output = eval_output_for(cfg)
    anchors = jax.device_put(image_anchors(cfg))
    geo = cfg.geometry
    rng = np.random.default_rng(0)

    for batch in [int(b) for b in args.batches.split(",")]:
        model, variables = init_detector(cfg, jax.random.PRNGKey(0), batch_size=batch)
        rgb = jnp.asarray(
            rng.normal(0, 1, (batch, geo.height, geo.width, 3)), jnp.float32
        )
        event = jnp.asarray(
            rng.normal(0, 1, (batch, geo.height, geo.width, geo.event_channels)),
            jnp.float32,
        )

        @jax.jit
        def infer(variables, anchors, rgb, event):
            cls, reg = model.apply(
                variables, rgb, event, train=False, eval_output=eval_output
            )
            return decode_detections(cls, reg, cfg, anchors=anchors)

        out = infer(variables, anchors, rgb, event)
        np.asarray(out[0])
        out = infer(variables, anchors, rgb, event)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer(variables, anchors, rgb, event)
        np.asarray(out[0])
        fps = batch * args.iters / (time.perf_counter() - t0)
        print(f"b{batch:<3d} {fps:7.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
