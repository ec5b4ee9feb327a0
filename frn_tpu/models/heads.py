"""Shared RetinaNet classification / regression heads.

Re-implements RegressionModel / ClassificationModel (model.py:85-168): 4x
(3x3 conv + ReLU) towers + output conv, shared across pyramid levels. Output
reshaping preserves the reference anchor order (cells row-major, the 9 base anchors
fastest) — NHWC gives this for free. Classification output conv is zero-init with
prior bias -log((1-p)/p) (model.py:237-243); regression output conv zero/zero.

Packed evaluation: because the tower weights are shared across levels, all five
pyramid levels are packed into ONE canvas image (1-px zero separators) and each
head runs once instead of five times — the small levels then ride the large
matmul's MXU utilization (measured 108 -> ~170 TFLOP/s on v5e) at +13% padded
positions. Exactness: a 3x3 window at a level edge must read zeros exactly like
that level's own conv padding; the separators guarantee this at the input, and a
zero-mask applied after each conv+relu restores it between layers (the conv bias
would otherwise leak relu(bias) into the separators). Values inside each level
region are bit-identical to the per-level path; separator outputs are sliced off.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from frn_tpu.models.layers import Conv


class RegressionHead(nn.Module):
    num_anchors: int = 9
    feature_size: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 raw: bool = False, mode: str = "rows") -> jnp.ndarray:
        """mode: 'rows' ((B, HWA, 4) — the reference contract) or 'flat36'
        ((B, HW, A*4): the free row-major flatten of the NHWC output map — no
        physical relayout. The round-5 device trace measured the 'rows'
        reshape at 0.64 ms/step @ b16 DSEC (a sublane/lane reshuffle of the
        full 172,800-anchor P2 table); the pooled postprocess instead gathers
        its ~400 candidates straight out of the flat36 layout)."""
        for i in range(1, 5):
            x = nn.relu(Conv(self.feature_size, 3, 1, 1, dtype=self.dtype, name=f"conv{i}")(x))
            if mask is not None:
                x = x * mask
        out = Conv(
            self.num_anchors * 4, 3, 1, 1,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="output",
        )(x)
        if raw:
            return out  # (B, H, W, A*4) NHWC map (packed path slices regions)
        b, h, w, _ = out.shape
        if mode == "flat36":
            return out.reshape(b, h * w, self.num_anchors * 4)
        return out.reshape(b, -1, 4)


class ClassificationHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    feature_size: int = 256
    prior: float = 0.01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 raw: bool = False, mode: str = "probs") -> jnp.ndarray:
        """mode: 'probs' (f32 sigmoid, reference contract), 'logits' (compute-
        dtype pre-sigmoid scores for the deferred-sigmoid eval fast path), or
        'logits_chanlast' (logits emitted class-major (B, K, hwA) so the
        postprocess per-class vmap needs no narrow-minor transpose)."""
        for i in range(1, 5):
            x = nn.relu(Conv(self.feature_size, 3, 1, 1, dtype=self.dtype, name=f"conv{i}")(x))
            if mask is not None:
                x = x * mask
        bias_value = -math.log((1.0 - self.prior) / self.prior)
        out = Conv(
            self.num_anchors * self.num_classes, 3, 1, 1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="output",
        )(x)
        if mode == "probs":
            out = nn.sigmoid(out.astype(jnp.float32))
        if raw:
            return out
        b = out.shape[0]
        if mode == "logits_chanlast":
            h, w, _ = out.shape[1:]
            out = out.reshape(b, h, w, self.num_anchors, self.num_classes)
            return out.transpose(0, 4, 1, 2, 3).reshape(b, self.num_classes, -1)
        return out.reshape(b, -1, self.num_classes)


def _pack_layout(shapes: Sequence[Tuple[int, int]], sep: int = 1):
    """Shelf-pack level shapes under the first level. Returns ((H, W), origins).

    Level 0 (the largest) spans the full canvas width; the rest fill shelves
    below it left-to-right with `sep` zero rows/cols between regions. For 3x3
    convs sep=1 suffices: an edge window reaches exactly one pixel out.
    """
    h0, w0 = shapes[0]
    width = w0
    origins: List[Tuple[int, int]] = [(0, 0)]
    y, x, shelf_h = h0 + sep, 0, 0
    for h, w in shapes[1:]:
        if x + w > width:
            y += shelf_h + sep
            x, shelf_h = 0, 0
        origins.append((y, x))
        x += w + sep
        shelf_h = max(shelf_h, h)
    return (y + shelf_h, width), origins


def pack_pyramid(features: Sequence[jnp.ndarray], sep: int = 1):
    """Pack NHWC levels into one canvas. Returns (canvas, mask, shapes, origins)."""
    shapes = [tuple(f.shape[1:3]) for f in features]
    (hh, ww), origins = _pack_layout(shapes, sep)
    b, _, _, c = features[0].shape
    canvas = jnp.zeros((b, hh, ww, c), features[0].dtype)
    for f, (y, x) in zip(features, origins):
        canvas = jax.lax.dynamic_update_slice(canvas, f, (0, y, x, 0))
    m = np.zeros((1, hh, ww, 1), np.float32)
    for (h, w), (y, x) in zip(shapes, origins):
        m[:, y:y + h, x:x + w] = 1.0
    return canvas, jnp.asarray(m, canvas.dtype), shapes, origins


def _unpack(out_map: jnp.ndarray, shapes, origins, last: int) -> jnp.ndarray:
    """Slice level regions off a head's canvas output, reshape to anchor rows."""
    b = out_map.shape[0]
    rows = []
    for (h, w), (y, x) in zip(shapes, origins):
        rows.append(out_map[:, y:y + h, x:x + w, :].reshape(b, -1, last))
    return jnp.concatenate(rows, axis=1)


def fused_dual_heads(
    cls_params, reg_params, features: Sequence[jnp.ndarray], num_classes: int,
    num_anchors: int = 9, dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both head towers in ONE conv chain per level via grouped convolutions.

    The cls and reg towers read the same pyramid feature, so layer 1 becomes a
    single 256->512 conv (outputs = [cls tower | reg tower]) and layers 2-4
    become feature_group_count=2 convs whose packed kernel is just
    concat([cls_kernel, reg_kernel], out_axis) — XLA assigns input channels
    0-255 to output group 0-255, exactly the separate-tower contraction. The
    output layer packs 256->27 (cls, zero-padded to 36) and 256->36 (reg) as a
    grouped 512->72 conv; pad outputs are sliced off.

    Measured on v5e @ b8 P2: 7.46 ms vs 8.61 for separate towers
    (tools/probe_heads2.py) — one wide MXU pass per layer instead of two
    narrower ones. Weight packing is 5 small concats per forward (~5 MB),
    amortized across all pyramid levels. Numerically this is the same set of
    per-group contractions the separate convs perform.

    cls_params/reg_params are the heads' raw param subtrees
    (classificationModel/regressionModel), read by the detector via
    self.variables — the checkpoint tree is unchanged.
    """
    a, c = num_anchors, num_classes

    def kb(p, name):
        q = p[name]["Conv_0"]
        return q["kernel"], q["bias"]

    layers = []
    for i in range(1, 5):
        ck, cb = kb(cls_params, f"conv{i}")
        rk, rb = kb(reg_params, f"conv{i}")
        layers.append((jnp.concatenate([ck, rk], axis=3),
                       jnp.concatenate([cb, rb], axis=0),
                       1 if i == 1 else 2))
    cok, cob = kb(cls_params, "output")   # (3,3,256,A*C), (A*C,)
    rok, rob = kb(reg_params, "output")   # (3,3,256,A*4), (A*4,)
    co, ro = a * c, a * 4
    pad = max(co, ro)
    cok = jnp.pad(cok, ((0, 0), (0, 0), (0, 0), (0, pad - co)))
    cob = jnp.pad(cob, (0, pad - co))
    rok = jnp.pad(rok, ((0, 0), (0, 0), (0, 0), (0, pad - ro)))
    rob = jnp.pad(rob, (0, pad - ro))
    out_k = jnp.concatenate([cok, rok], axis=3)  # (3,3,256,2*pad), groups=2
    out_b = jnp.concatenate([cob, rob], axis=0)

    if dtype is not None:
        layers = [(k.astype(dtype), b.astype(dtype), g) for k, b, g in layers]
        out_k, out_b = out_k.astype(dtype), out_b.astype(dtype)

    def conv(x, k, b, groups):
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        return y + b

    cls_rows, reg_rows = [], []
    for f in features:
        x = f.astype(dtype) if dtype is not None else f
        for k, b_, g in layers:
            x = nn.relu(conv(x, k, b_, g))
        out = conv(x, out_k, out_b, 2)
        b = out.shape[0]
        cls_map = nn.sigmoid(out[..., :co].astype(jnp.float32))
        reg_map = out[..., pad:pad + ro]
        cls_rows.append(cls_map.reshape(b, -1, c))
        reg_rows.append(reg_map.reshape(b, -1, 4))
    return (jnp.concatenate(cls_rows, axis=1),
            jnp.concatenate(reg_rows, axis=1))


def apply_heads(
    cls_head: nn.Module, reg_head: nn.Module, features: Sequence[jnp.ndarray],
    packed: bool = False, cls_mode: str = "probs", reg_mode: str = "rows",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run shared heads over all pyramid levels, concat along the anchor dim.

    packed=False is the measured default on v5e: the canvas path came out
    SLOWER end-to-end (21.7 vs 18.7 ms for both heads at b8, DSEC geometry) —
    the update-slice/mask/slice overheads and the canvas's odd tiling beat the
    per-level utilization win. Kept (exact, tested) for other geometries.

    cls_mode: classification emission mode (see ClassificationHead.__call__);
    'logits'/'logits_chanlast' serve the pooled-decode eval fast path. The
    packed-canvas path only supports 'probs'."""
    if cls_mode != "probs":
        axis = 2 if cls_mode == "logits_chanlast" else 1
        regression = jnp.concatenate(
            [reg_head(f, mode=reg_mode) for f in features], axis=1
        )
        classification = jnp.concatenate(
            [cls_head(f, mode=cls_mode) for f in features], axis=axis
        )
        return classification, regression
    if packed and len(features) > 1:
        canvas, mask, shapes, origins = pack_pyramid(features)
        reg_map = reg_head(canvas, mask=mask, raw=True)
        cls_map = cls_head(canvas, mask=mask, raw=True)
        num_anchors = reg_map.shape[-1] // 4
        regression = _unpack(reg_map, shapes, origins, 4)
        classification = _unpack(
            cls_map, shapes, origins, cls_map.shape[-1] // num_anchors
        )
        return classification, regression
    regression = jnp.concatenate([reg_head(f) for f in features], axis=1)
    classification = jnp.concatenate([cls_head(f) for f in features], axis=1)
    return classification, regression
