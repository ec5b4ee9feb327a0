"""Full-graph A/B + detection agreement for the int8 attention serving mode.

Measures (one chip, production geometry, pooled_chanlast postprocess):
  base       exact bf16 flash attention (ModelConfig.attention_quant=None)
  int8_qk    QK^T on the int8 MXU path (2x rate), softmax weights + PV exact
  int8       QK^T and PV both int8

For each quantized variant, also reports detection agreement vs base on the
SAME random inputs: rank-matched score MAD, box IoU, and label agreement over
entries both paths detect (score > threshold). The mAP-delta story on a
trained model lives in tools/run_int8_map_delta.sh.

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/bench_int8.py [--batch 16] [--iters 20] [--smoke]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def agreement(base, other, score_thr=0.05):
    """Rank-matched detection agreement stats between two (scores, labels, boxes)."""
    bs, bl, bb = (np.asarray(x) for x in base)
    os_, ol, ob = (np.asarray(x) for x in other)
    both = (bs > score_thr) & (os_ > score_thr)
    n = int(both.sum())
    if n == 0:
        return {"matched": 0}
    score_mad = float(np.abs(bs[both] - os_[both]).mean())
    label_agree = float((bl[both] == ol[both]).mean())
    b1, b2 = bb[both], ob[both]
    x1 = np.maximum(b1[:, 0], b2[:, 0]); y1 = np.maximum(b1[:, 1], b2[:, 1])
    x2 = np.minimum(b1[:, 2], b2[:, 2]); y2 = np.minimum(b1[:, 3], b2[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
    count_delta = abs(int((bs > score_thr).sum()) - int((os_ > score_thr).sum()))
    return {
        "matched": n,
        "score_mad": round(score_mad, 5),
        "mean_iou": round(float(iou.mean()), 4),
        "label_agree": round(label_agree, 4),
        "count_delta": count_delta,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry on CPU: validates tracing only (the "
                    "quant path needs TPU; smoke exercises config plumbing)")
    args = ap.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.iters = 2, 1

    from frn_tpu.utils.cache import enable_compilation_cache
    if not args.smoke:
        enable_compilation_cache()
    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.models.detector import (
        decode_detections, eval_output_for, image_anchors, init_detector,
    )

    base_cfg = FrameworkConfig(
        geometry=dataclasses.replace(DSEC, height=96, width=128) if args.smoke else DSEC,
        model=ModelConfig(variant="fusion", depth=18 if args.smoke else 50,
                          num_classes=3,
                          feature_size=32 if args.smoke else 256,
                          compute_dtype="bfloat16"),
    )
    model, variables = init_detector(base_cfg, jax.random.PRNGKey(0), batch_size=args.batch)
    anchors = jax.device_put(image_anchors(base_cfg))
    geo = base_cfg.geometry
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(0, 1, (args.batch, geo.height, geo.width, 3)), jnp.float32)
    event = jnp.asarray(
        rng.normal(0, 1, (args.batch, geo.height, geo.width, geo.event_channels)),
        jnp.float32,
    )

    def sync(o):
        np.asarray(o[0])

    from frn_tpu.models.detector import FRNDetector

    def run(quant):
        cfg = dataclasses.replace(
            base_cfg, model=dataclasses.replace(base_cfg.model, attention_quant=quant)
        )
        # rebuild the module from the variant config (attention_quant is read
        # from the module's own config at trace time); params are identical
        m = FRNDetector(cfg)
        eval_output = eval_output_for(cfg)

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
        fps = args.batch * args.iters / (time.perf_counter() - t0)
        return fps, jax.device_get(out)

    fps0, det0 = run(None)
    print(f"{'base':10s} {fps0:7.2f} img/s", flush=True)
    for quant in ("int8_qk", "int8"):
        fps, det = run(quant)
        agr = agreement(det0, det)
        print(f"{quant:10s} {fps:7.2f} img/s  agreement={agr}", flush=True)


if __name__ == "__main__":
    main()
