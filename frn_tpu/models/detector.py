"""End-to-end detector assembly: the three FRN variants behind one config.

Re-implements ResNet_fpn_fusion / ResNet (event-only) / ResNet_rgb
(model.py:171-701) as one flax module. Differences from the reference, by design:

  * forward is pure: it returns (classification probs, regression deltas); the loss
    (training) and decoded detections (eval) are separate jit-able functions, so one
    compiled forward serves both paths and batching is first-class (the reference's
    eval branch assumes batch 1, model.py:341).
  * anchors are a trace-time constant of the static image shape (core/anchors.py).
  * RGB modality dropout (p=0.15 whole-batch zeroing during fusion training,
    model.py:279-280) uses a flax RNG stream.
  * fusion stages are called as fus(event, rgb), replicating the reference argument
    order at model.py:305-308.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from frn_tpu.config import FrameworkConfig
from frn_tpu.core.anchors import anchors_for_shape
from frn_tpu.core.boxes import clip_boxes, decode_boxes
from frn_tpu.core.losses import focal_detection_loss
from frn_tpu.core.nms import batched_detection_postprocess
from frn_tpu.models.fpn import PyramidFeatures
from frn_tpu.models.fusion import REFusion
from frn_tpu.models.heads import ClassificationHead, RegressionHead, apply_heads
from frn_tpu.models.resnet import ResNetBackbone


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class FRNDetector(nn.Module):
    """Inputs NHWC: rgb (B,H,W,3) normalized, event (B,H,W,5) voxel grid.

    Returns (classification (B,A,K) sigmoid probs f32, regression (B,A,4) f32).
    """

    config: FrameworkConfig

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, event: jnp.ndarray, train: bool = False,
                 eval_output: str = "probs"):
        """eval_output selects the eval fast-path emission (EvalConfig.postprocess):
        'probs' (default, reference contract: f32 sigmoid cls + f32 reg),
        'logits' (compute-dtype cls logits + reg deltas for pooled deferred-
        sigmoid decode), 'logits_chanlast' (cls logits class-major (B, K, A))."""
        cfg = self.config
        mc = cfg.model
        dtype = _dtype_of(mc.compute_dtype)
        variant = mc.variant

        if variant == "fusion" and train and mc.modality_dropout > 0:
            # whole-batch RGB blanking with p=0.15 (model.py:279-280)
            drop = jax.random.bernoulli(
                self.make_rng("modality"), mc.modality_dropout
            )
            rgb = jnp.where(drop, jnp.zeros_like(rgb), rgb)

        rgb = rgb.astype(dtype)
        event = event.astype(dtype)

        # Pallas stem: inference only (no VJP) and TPU backends only
        stem_kernel = mc.stem_kernel and not train
        if stem_kernel:
            from frn_tpu.ops.stem import stem_kernel_available

            stem_kernel = stem_kernel_available()

        if variant == "fusion":
            rgb_feats = ResNetBackbone(
                layers=mc.block_layers, bottleneck=mc.bottleneck, dtype=dtype,
                stem_kernel=stem_kernel, name="rgb_backbone",
            )(rgb)
            evt_feats = ResNetBackbone(
                layers=mc.block_layers, bottleneck=mc.bottleneck, dtype=dtype,
                stem_kernel=stem_kernel, name="event_backbone",
            )(event)
            stage_channels = (256, 512, 1024, 2048) if mc.bottleneck else (64, 128, 256, 512)
            fused = tuple(
                REFusion(
                    channels=c, chunk=mc.attention_chunk, dtype=dtype,
                    # bf16-exp flash softmax + int8 quant: inference only (no VJP)
                    exp_bf16=mc.flash_exp_bf16 and not train,
                    quant=mc.attention_quant if not train else None,
                    fused_attention=mc.fused_attention,
                    name=f"fus_{i}",
                )(e, r)  # (event, rgb) order per model.py:305-308
                for i, (c, e, r) in enumerate(zip(stage_channels, evt_feats, rgb_feats))
            )
            feats = fused
        elif variant == "event":
            feats = ResNetBackbone(
                layers=mc.block_layers, bottleneck=mc.bottleneck, dtype=dtype,
                stem_kernel=stem_kernel, name="backbone",
            )(event)
        elif variant == "rgb":
            feats = ResNetBackbone(
                layers=mc.block_layers, bottleneck=mc.bottleneck, dtype=dtype,
                stem_kernel=stem_kernel, name="backbone",
            )(rgb)
        else:
            raise ValueError(f"Unknown variant {variant!r}")

        pyramid = PyramidFeatures(
            feature_size=mc.feature_size,
            upsample=cfg.geometry.fpn_upsample,
            dtype=dtype,
            name="fpn",
        )(feats)

        cls_head = ClassificationHead(
            num_classes=mc.num_classes,
            num_anchors=cfg.anchors.num_anchors_per_cell,
            feature_size=mc.feature_size,
            prior=mc.prior,
            dtype=dtype,
            name="classificationModel",
        )
        reg_head = RegressionHead(
            num_anchors=cfg.anchors.num_anchors_per_cell,
            feature_size=mc.feature_size,
            dtype=dtype,
            name="regressionModel",
        )
        if eval_output != "probs":
            # pooled-decode fast path: logits in compute dtype, no full-table
            # f32 casts — decode_detections sigmoids/casts only the NMS pool.
            # 'logits_chanlast36' additionally keeps regression in the free
            # (B, HW, A*4) flatten of the NHWC head maps (EvalConfig.reg_flat36)
            classification, regression = apply_heads(
                cls_head, reg_head, pyramid,
                cls_mode={
                    "logits": "logits",
                    "logits_chanlast": "logits_chanlast",
                    "logits_chanlast36": "logits_chanlast",
                }[eval_output],
                reg_mode="flat36" if eval_output == "logits_chanlast36" else "rows",
            )
            return classification, regression
        if mc.fused_heads and not self.is_initializing():
            # grouped-conv dual-head fast path: reads the heads' raw kernels via
            # self.variables (same param tree; init still builds the modules
            # below so checkpoints/converters are unchanged)
            from frn_tpu.models.heads import fused_dual_heads

            p = self.variables["params"]
            classification, regression = fused_dual_heads(
                p["classificationModel"], p["regressionModel"], pyramid,
                num_classes=mc.num_classes,
                num_anchors=cfg.anchors.num_anchors_per_cell,
                dtype=dtype,
            )
        else:
            classification, regression = apply_heads(cls_head, reg_head, pyramid)
        return classification.astype(jnp.float32), regression.astype(jnp.float32)


def eval_output_for(config: FrameworkConfig) -> str:
    """The model `eval_output` matching EvalConfig.postprocess.

    Every eval caller that pairs `model.apply(train=False)` with
    `decode_detections` must pass `eval_output=eval_output_for(cfg)` so the
    heads emit the layout the configured postprocess expects (probs for
    dense/pooled, logits for pooled_logits, class-major logits for
    pooled_chanlast — the measured default, see EvalConfig.postprocess).
    """
    out = {
        "pooled_logits": "logits", "pooled_chanlast": "logits_chanlast",
    }.get(config.eval.postprocess, "probs")
    if out == "logits_chanlast" and config.eval.reg_flat36:
        return "logits_chanlast36"
    return out


def image_anchors(config: FrameworkConfig) -> jnp.ndarray:
    """Anchors for the configured static geometry — a compile-time constant."""
    geo = config.geometry
    return jnp.asarray(anchors_for_shape((geo.height, geo.width), config.anchors))


def detection_loss(
    classification: jnp.ndarray,
    regression: jnp.ndarray,
    annotations: jnp.ndarray,
    config: FrameworkConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cls_loss, reg_loss) per reference FocalLoss semantics."""
    return focal_detection_loss(
        classification, regression, image_anchors(config), annotations,
        std=config.box_coder.std,
    )


def decode_detections(
    classification: jnp.ndarray,
    regression: jnp.ndarray,
    config: FrameworkConfig,
    anchors: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched decode + clip + class-wise NMS, all on device.

    Returns (scores (B,M), labels (B,M) int32, boxes (B,M,4)); M = max_detections.
    Pass `anchors` explicitly when calling under jit to keep the ~MB anchor table a
    runtime argument rather than an embedded HLO literal.
    """
    geo, ev = config.geometry, config.eval
    if anchors is None:
        anchors = image_anchors(config)
    # Trace-time wiring check: the classification layout must match the
    # configured postprocess (a model called without the matching
    # eval_output_for(config) would otherwise decode garbage silently).
    a = anchors.shape[0]
    anchor_dim = 2 if ev.postprocess == "pooled_chanlast" else 1
    if classification.shape[anchor_dim] != a:
        raise ValueError(
            f"classification shape {classification.shape} does not put the "
            f"anchor dim ({a}) at axis {anchor_dim} as postprocess="
            f"{ev.postprocess!r} requires; call the model with "
            "eval_output=eval_output_for(config)"
        )
    # reg_flat36: regression rides as (B, HW, A*4) — the free flatten of the
    # NHWC head maps (A*4 total elements per cell == A anchors x 4 deltas)
    reg_elems = regression.shape[1] * (regression.shape[2] // 4)
    if ev.reg_flat36 and ev.postprocess == "pooled_chanlast":
        if regression.shape[2] == 4 or reg_elems != a:
            raise ValueError(
                f"EvalConfig.reg_flat36 expects regression (B, HW, A*4) "
                f"covering {a} anchors, got {regression.shape}; call the "
                "model with eval_output=eval_output_for(config)"
            )
    elif regression.shape[2] != 4 or regression.shape[1] != a:
        raise ValueError(
            f"regression shape {regression.shape} does not match the "
            f"(B, {a}, 4) layout postprocess={ev.postprocess!r} requires"
        )
    if ev.postprocess != "dense":
        # Pool-first decode: per-class score top-k, then decode/clip only the
        # pooled candidates (bitwise-identical; core/nms.py for the argument).
        # 'pooled_logits'/'pooled_chanlast' additionally expect the model to
        # have been called with the matching eval_output (heads emit logits).
        from frn_tpu.core.nms import pooled_detection_postprocess

        return pooled_detection_postprocess(
            anchors,
            regression,
            classification,
            (geo.height, geo.width),
            std=config.box_coder.std,
            score_threshold=ev.score_threshold,
            iou_threshold=ev.nms_iou,
            per_class_topk=ev.per_class_topk,
            max_detections=ev.max_detections,
            approx_topk=ev.approx_topk,
            logits=ev.postprocess in ("pooled_logits", "pooled_chanlast"),
            class_major=ev.postprocess == "pooled_chanlast",
            exact_pool=ev.exact_pool,
        )
    boxes = decode_boxes(anchors, regression, std=config.box_coder.std)
    boxes = clip_boxes(boxes, (geo.height, geo.width))
    return batched_detection_postprocess(
        boxes,
        classification,
        score_threshold=ev.score_threshold,
        iou_threshold=ev.nms_iou,
        per_class_topk=ev.per_class_topk,
        max_detections=ev.max_detections,
        approx_topk=ev.approx_topk,
        exact_pool=ev.exact_pool,
    )


def init_detector(config: FrameworkConfig, rng: jax.Array, batch_size: int = 1):
    """Initialize (model, variables) on host-shaped zeros."""
    geo = config.geometry
    model = FRNDetector(config)
    rgb = jnp.zeros((batch_size, geo.height, geo.width, 3), jnp.float32)
    event = jnp.zeros((batch_size, geo.height, geo.width, geo.event_channels), jnp.float32)
    variables = model.init({"params": rng, "modality": rng}, rgb, event, train=False)
    return model, variables
