"""Equivalence of the pooled-decode eval fast path vs the dense path.

The pooled path (core/nms.py pooled_class_aware_nms) reorders decode after the
per-class score top-k; decode is per-anchor elementwise and ranking depends on
scores alone, so every ladder rung must reproduce the dense reference pipeline
(decode all -> clip -> class_aware_nms) exactly:

  pooled          same inputs, gather-then-decode == decode-then-gather (bitwise)
  pooled_logits   heads emit logits; sigma is strictly monotone, so thresholding
                  and top-k in logit space select the same pool
  pooled_chanlast + scores arrive class-major (K, A): pure layout change
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frn_tpu.config import FrameworkConfig, geometry_for
from frn_tpu.core.boxes import clip_boxes, decode_boxes
from frn_tpu.core.nms import (
    class_aware_nms,
    pooled_class_aware_nms,
    pooled_detection_postprocess,
)

RNG = np.random.default_rng(7)
H, W = 96, 128
A, K, T, M = 900, 3, 64, 20


def _random_problem(rng=RNG, a=A):
    anchors = np.stack(
        [
            rng.uniform(0, W - 30, a),
            rng.uniform(0, H - 30, a),
            np.zeros(a),
            np.zeros(a),
        ],
        axis=1,
    ).astype(np.float32)
    anchors[:, 2] = anchors[:, 0] + rng.uniform(4, 40, a)
    anchors[:, 3] = anchors[:, 1] + rng.uniform(4, 40, a)
    deltas = rng.normal(0, 0.5, (a, 4)).astype(np.float32)
    logits = rng.normal(-2.5, 1.5, (a, K)).astype(np.float32)  # sigma in (0,1), no saturation
    return anchors, deltas, logits


def _dense(anchors, deltas, probs, approx):
    boxes = clip_boxes(decode_boxes(jnp.asarray(anchors), jnp.asarray(deltas)), (H, W))
    return class_aware_nms(
        boxes, jnp.asarray(probs), per_class_topk=T, max_detections=M,
        approx_topk=approx,
    )


@pytest.mark.parametrize("approx", [False, True])
def test_pooled_probs_matches_dense_exactly(approx):
    anchors, deltas, logits = _random_problem()
    probs = 1.0 / (1.0 + np.exp(-logits))
    ds, dl, db = [np.asarray(o) for o in _dense(anchors, deltas, probs, approx)]
    ps, plb, pb = [
        np.asarray(o)
        for o in pooled_class_aware_nms(
            jnp.asarray(anchors), jnp.asarray(deltas), jnp.asarray(probs),
            (H, W), per_class_topk=T, max_detections=M, approx_topk=approx,
        )
    ]
    np.testing.assert_array_equal(ds, ps)
    np.testing.assert_array_equal(dl, plb)
    np.testing.assert_array_equal(db[ds > 0], pb[ps > 0])


@pytest.mark.parametrize("class_major", [False, True])
def test_pooled_logits_matches_dense(class_major):
    anchors, deltas, logits = _random_problem()
    probs = np.asarray(jax.nn.sigmoid(jnp.asarray(logits)))  # f32 sigma, like the model
    ds, dl, db = [np.asarray(o) for o in _dense(anchors, deltas, probs, False)]
    s_in = jnp.asarray(logits.T if class_major else logits)
    ps, plb, pb = [
        np.asarray(o)
        for o in pooled_class_aware_nms(
            jnp.asarray(anchors), jnp.asarray(deltas), s_in, (H, W),
            per_class_topk=T, max_detections=M, approx_topk=False,
            logits=True, class_major=class_major,
        )
    ]
    np.testing.assert_array_equal(ds, ps)
    np.testing.assert_array_equal(dl, plb)
    np.testing.assert_array_equal(db[ds > 0], pb[ps > 0])


def test_pooled_logits_bf16_matches_dense_on_bf16_probs():
    """The fast path feeds bf16 logits; dense reference = sigma(f32(bf16 logit))."""
    anchors, deltas, logits = _random_problem()
    lb = jnp.asarray(logits, jnp.bfloat16)
    probs = jax.nn.sigmoid(lb.astype(jnp.float32))
    ds, dl, db = [np.asarray(o) for o in _dense(anchors, deltas, probs, False)]
    ps, plb, pb = [
        np.asarray(o)
        for o in pooled_class_aware_nms(
            jnp.asarray(anchors), jnp.asarray(deltas, jnp.bfloat16), lb, (H, W),
            per_class_topk=T, max_detections=M, approx_topk=False, logits=True,
        )
    ]
    np.testing.assert_array_equal(ds, ps)
    np.testing.assert_array_equal(dl, plb)
    # dense decoded from f32(bf16 deltas) == pooled gather-then-cast
    dense_boxes_bf16 = clip_boxes(
        decode_boxes(
            jnp.asarray(anchors),
            jnp.asarray(deltas, jnp.bfloat16).astype(jnp.float32),
        ),
        (H, W),
    )
    ref = class_aware_nms(
        dense_boxes_bf16, probs, per_class_topk=T, max_detections=M,
        approx_topk=False,
    )
    np.testing.assert_array_equal(np.asarray(ref[2])[ds > 0], pb[ps > 0])


def test_batched_pooled_postprocess_shapes():
    anchors, deltas, logits = _random_problem()
    b = 3
    dd = jnp.asarray(np.stack([deltas] * b))
    ss = jnp.asarray(np.stack([logits] * b))
    s, l, bx = pooled_detection_postprocess(
        jnp.asarray(anchors), dd, ss, (H, W), per_class_topk=T,
        max_detections=M, approx_topk=False, logits=True,
    )
    assert s.shape == (b, M) and l.shape == (b, M) and bx.shape == (b, M, 4)
    np.testing.assert_array_equal(np.asarray(s[0]), np.asarray(s[2]))


@pytest.mark.parametrize(
    "postprocess",
    ["pooled", "pooled_logits", "pooled_chanlast", "pooled_chanlast+reg36"],
)
def test_end_to_end_model_fast_path_matches_dense(postprocess):
    """Tiny-geometry detector: each EvalConfig.postprocess rung reproduces the
    dense pipeline's detections through the real model + decode_detections."""
    import dataclasses

    from frn_tpu.config import DatasetGeometry, EvalConfig, ModelConfig
    from frn_tpu.models.detector import decode_detections, init_detector

    geo = DatasetGeometry(
        name="dsec", height=64, width=96, num_classes=3,
        class_names=("a", "b", "c"), rgb_mean=(0.5, 0.5, 0.5),
        rgb_std=(1, 1, 1),
    )
    base = FrameworkConfig(
        geometry=geo,
        model=ModelConfig(variant="fusion", depth=18, feature_size=32,
                          num_classes=3, compute_dtype="bfloat16"),
        eval=EvalConfig(per_class_topk=32, max_detections=10, approx_topk=False,
                        postprocess="dense"),  # explicit dense baseline
    )
    model, variables = init_detector(base, jax.random.PRNGKey(0), batch_size=1)
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
    event = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 5)), jnp.float32)

    cls_d, reg_d = model.apply(variables, rgb, event, train=False)
    ds, dl, db = [np.asarray(o) for o in decode_detections(cls_d, reg_d, base)]

    reg36 = postprocess.endswith("+reg36")
    postprocess = postprocess.removesuffix("+reg36")
    eval_output = {
        "pooled": "probs", "pooled_logits": "logits",
        "pooled_chanlast": "logits_chanlast36" if reg36 else "logits_chanlast",
    }[postprocess]
    cls_f, reg_f = model.apply(
        variables, rgb, event, train=False, eval_output=eval_output
    )
    if reg36:
        # flat36 regression: (B, HW, A*4) — the free NHWC flatten
        assert reg_f.shape[-1] != 4 and reg_f.shape[-1] % 4 == 0
    cfg = dataclasses.replace(
        base, eval=dataclasses.replace(
            base.eval, postprocess=postprocess, reg_flat36=reg36
        )
    )
    fs, fl, fb = [np.asarray(o) for o in decode_detections(cls_f, reg_f, cfg)]

    # bf16 compute: the prob path sigmoids in f32 from the same bf16 logits, so
    # scores agree bitwise; boxes decode from the same deltas (f32-cast order
    # commutes with gather)
    np.testing.assert_allclose(ds, fs, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(dl, fl)
    np.testing.assert_allclose(db[ds > 0.05], fb[fs > 0.05], rtol=0, atol=1e-4)
