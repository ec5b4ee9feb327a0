"""Batched on-device detection extraction.

Replaces the reference's per-image, host-looped eval (_get_detections,
csv_eval.py:66-131, batch=1, per-class python NMS loops) with one jitted program:
forward + decode + clip + class-wise NMS for a whole batch, returning fixed-size
top-k detections. The host only slices valid rows and buckets them per class.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import numpy as np

from frn_tpu.config import FrameworkConfig
from frn_tpu.data.loader import BatchLoader, device_prefetch
from frn_tpu.models.detector import decode_detections


def make_inference_fn(
    model,
    variables,
    config: FrameworkConfig,
    mesh=None,
    wire: str = "f32",
    rgb_standardize: bool = False,
    input_format: str = "default",
) -> Callable:
    """jit-compiled (rgb, event) -> (scores (B,M), labels (B,M), boxes (B,M,4)).

    Variables and the anchor table ride as runtime jit arguments (not HLO
    literals), keeping the serialized program small.

    With `mesh`, inference is data-parallel over the mesh's 'data' axis — the
    TPU-native replacement for the reference's DataParallel eval wrap
    (test_dsec.py:103-105): params/anchors replicated, batch sharded, identical
    per-image numerics (each image's postprocess is independent). The batch size
    must be a multiple of the data-axis size.

    `wire='compact'` moves input normalization INTO the jitted program: batches
    arrive as uint8 RGB [0..255] + int8 raw polarity-count voxels (4x fewer
    host->device bytes — the input link, not compute, bounds streaming eval on
    hosted TPUs; measured in tools/bench_serve.py for the identical serving
    path) and the device applies /255 (+ dataset standardization iff
    `rgb_standardize` — the raw DSEC-Det path feeds [0,1] RGB, so the default
    mirrors DSECDetDataset(normalize_rgb=False)) and the conditional tanh voxel
    squash (dsec_data.py:461-462 semantics). Pair with a
    `compact_wire=True` dataset; results match the f32 pipeline (int8 clipping
    at ±127 is exact through tanh saturation — see serve/engine.py).
    """
    if wire not in ("f32", "compact"):
        raise ValueError(f"unknown wire {wire!r}")
    if input_format not in ("default", "auto"):
        raise ValueError(f"unknown input_format {input_format!r}")
    if input_format == "auto" and mesh is not None:
        raise ValueError("input_format='auto' is single-device only (the AUTO "
                         "layout query composes with SingleDeviceSharding)")
    from frn_tpu.models.detector import image_anchors
    from frn_tpu.parallel.mesh import batch_sharding, replicate, replicated_sharding

    if mesh is not None:
        variables = replicate(variables, mesh)
        anchors = jax.device_put(
            image_anchors(config), replicated_sharding(mesh)
        )
        bsh = batch_sharding(mesh)
    else:
        anchors = jax.device_put(image_anchors(config))
        bsh = None

    # pooled_logits/pooled_chanlast postprocess needs the heads to emit logits
    # in the matching layout (EvalConfig.postprocess docs in config.py)
    from frn_tpu.models.detector import eval_output_for

    eval_output = eval_output_for(config)

    import jax.numpy as jnp

    geo = config.geometry
    rgb_mean = jnp.asarray(geo.rgb_mean, jnp.float32)
    rgb_std = jnp.asarray(geo.rgb_std, jnp.float32)

    def _infer_impl(variables, anchors, rgb, event):
        # wire/dataset agreement check (trace-time): a compact-wire dataset fed
        # to a f32 inference fn (or vice versa) would silently produce garbage
        # — raw [0,255] uint8 through the model, or [0,1] floats /255 again.
        if wire == "compact":
            if rgb.dtype != jnp.uint8 or event.dtype != jnp.int8:
                raise TypeError(
                    f"wire='compact' expects uint8 RGB + int8 event voxels, got "
                    f"rgb={rgb.dtype} event={event.dtype} — pass a "
                    "compact_wire=True dataset or use wire='f32'"
                )
        elif jnp.issubdtype(rgb.dtype, jnp.integer) or jnp.issubdtype(
            event.dtype, jnp.integer
        ):
            raise TypeError(
                f"wire='f32' got integer inputs (rgb={rgb.dtype}, "
                f"event={event.dtype}) — this looks like a compact_wire dataset; "
                "pass wire='compact' to make_inference_fn"
            )
        if wire == "compact":
            from frn_tpu.ops.voxelize import normalize_event_voxel_batched

            rgb = rgb.astype(jnp.float32) / 255.0
            if rgb_standardize:
                rgb = (rgb - rgb_mean) / rgb_std
            event = normalize_event_voxel_batched(event.astype(jnp.float32))
        cls, reg = model.apply(
            variables, rgb, event, train=False, eval_output=eval_output
        )
        return decode_detections(cls, reg, config, anchors=anchors)

    if input_format == "auto":
        # Let XLA choose the ARGUMENT layouts (jit in_shardings=Format(AUTO))
        # and deliver every input already in them: the round-5 device trace
        # measured 0.93 ms/step @ b16 DSEC of in-graph relayout copy on the
        # (B, H, W, 5) voxel input alone (XLA wants batch-minor tiled image
        # inputs), and the full-graph A/B measured +1.0 ms/step. Params and
        # anchors are placed once per compiled shape; the per-batch
        # device_put(x, format) IS the host->device transfer a streaming
        # pipeline already pays — not an extra pass.
        from jax.experimental.layout import Format, Layout

        _auto = Format(Layout.AUTO)
        _jitted = jax.jit(_infer_impl, in_shardings=(_auto,) * 4)
        _state = {}

        def _infer(variables_, anchors_, rgb, event):
            key = (rgb.shape, str(rgb.dtype), event.shape, str(event.dtype))
            entry = _state.get(key)
            if entry is None:
                compiled = _jitted.lower(
                    variables_, anchors_, rgb, event
                ).compile()
                vf, af, rf, ef = compiled.input_formats[0]
                v_put = jax.tree_util.tree_map(jax.device_put, variables_, vf)
                entry = (compiled, v_put, jax.device_put(anchors_, af), rf, ef)
                _state[key] = entry
            compiled, v_put, a_put, rf, ef = entry
            return compiled(
                v_put, a_put, jax.device_put(rgb, rf), jax.device_put(event, ef)
            )
    else:
        _infer = jax.jit(_infer_impl)

    def infer(rgb, event):
        if bsh is not None:
            rgb = jax.device_put(rgb, bsh)
            event = jax.device_put(event, bsh)
        return _infer(variables, anchors, rgb, event)

    return infer


def collect_detections(
    dataset,
    infer_fn: Callable,
    config: FrameworkConfig,
    batch_size: int = 8,
    num_threads: int = 8,
    max_detections: Optional[int] = None,
    verbose: bool = False,
) -> Tuple[List[List[np.ndarray]], float]:
    """Run the detector over a dataset.

    Returns (all_detections[image][class] -> (n,5) [x1,y1,x2,y2,score], elapsed_s).
    Detections are score-sorted (the on-device top-k emits descending order),
    matching the reference's per-image sort + top-100 (csv_eval.py:109-119).
    """
    num_classes = dataset.num_classes()
    cap = max_detections or config.eval.max_detections
    thr = config.eval.score_threshold

    loader = BatchLoader(
        dataset, config.geometry, batch_size=batch_size, shuffle=False,
        num_threads=num_threads, max_annots=1,
    )

    all_detections: List[List[np.ndarray]] = [
        [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
        for _ in range(len(dataset))
    ]

    t0 = time.perf_counter()
    index = 0
    for batch in device_prefetch(iter(loader), size=2):
        scores, labels, boxes = infer_fn(batch["rgb"], batch["event"])
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        boxes = np.asarray(boxes)
        n_valid = int(np.asarray(batch["sample_mask"]).sum())
        for b in range(n_valid):
            keep = scores[b] > thr
            s, l, bx = scores[b][keep][:cap], labels[b][keep][:cap], boxes[b][keep][:cap]
            dets = np.concatenate([bx, s[:, None]], axis=1).astype(np.float32)
            for c in range(num_classes):
                all_detections[index][c] = dets[l == c]
            index += 1
            if verbose and index % 100 == 0:
                print(f"{index}/{len(dataset)}", end="\r")
    elapsed = time.perf_counter() - t0
    return all_detections, elapsed


def collect_annotations(dataset) -> List[List[np.ndarray]]:
    """Ground truth per image per class (csv_eval.py _get_annotations)."""
    num_classes = dataset.num_classes()
    out = []
    for i in range(len(dataset)):
        ann = dataset.load_annotations(i)
        out.append([ann[ann[:, 4] == c, :4].copy() for c in range(num_classes)])
    return out
