"""Fixed-shape batching for TPU.

The reference pads each batch to its own max image size and max annotation count
(dataloader.py:404-450) — dynamic shapes that would force an XLA recompile per
batch. Here every batch is padded to the static dataset geometry and a fixed
annotation capacity, so one compiled program serves the whole run.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from frn_tpu.config import DatasetGeometry


def collate_fixed(
    samples: Sequence[Dict[str, np.ndarray]],
    geometry: DatasetGeometry,
    max_annots: int = 64,
    batch_size: int | None = None,
) -> Dict[str, np.ndarray]:
    """Stack samples into fixed-shape arrays.

    Images are zero-padded bottom/right to (H, W) (reference collater semantics);
    annotations padded with -1 rows and truncated at max_annots; short batches
    zero-padded to batch_size with a validity mask in 'sample_mask'.
    """
    h, w = geometry.height, geometry.width
    bsz = batch_size or len(samples)
    n = len(samples)
    assert n <= bsz

    if "event_x" in samples[0]:
        # 'events' wire (DSECDetDataset(events_wire=True)): raw padded streams,
        # voxelized on device inside the jitted step (train/loop.py /
        # ops/voxelize.voxelize_events_batched). Per-sample arrays are already
        # capacity-padded; just stack + batch-pad.
        cap = samples[0]["event_x"].shape[0]
        out = {
            "event_x": np.zeros((bsz, cap), np.int16),
            "event_y": np.zeros((bsz, cap), np.int16),
            "event_t": np.zeros((bsz, cap), np.int32),
            "event_p": np.zeros((bsz, cap), np.int8),
            "event_n": np.zeros((bsz,), np.int32),
        }
        rgbs = np.zeros((bsz, h, w, 3), dtype=samples[0]["rgb"].dtype)
        annots = np.full((bsz, max_annots, 5), -1.0, dtype=np.float32)
        mask = np.zeros((bsz,), dtype=bool)
        for i, s in enumerate(samples):
            for key in ("event_x", "event_y", "event_t", "event_p"):
                out[key][i] = s[key]
            out["event_n"][i] = s["event_n"]
            r = s["rgb"]
            rgbs[i, : r.shape[0], : r.shape[1], :] = r[:h, :w]
            a = s["annot"]
            k = min(len(a), max_annots)
            if k:
                annots[i, :k] = a[:k]
            mask[i] = True
        out.update(rgb=rgbs, annot=annots, sample_mask=mask)
        return out

    ev_c = samples[0]["event"].shape[-1]
    for s in samples[1:]:
        if (
            s["event"].dtype != samples[0]["event"].dtype
            or s["rgb"].dtype != samples[0]["rgb"].dtype
        ):
            raise TypeError(
                "collate_fixed: heterogeneous sample dtypes (event "
                f"{s['event'].dtype} vs {samples[0]['event'].dtype}, rgb "
                f"{s['rgb'].dtype} vs {samples[0]['rgb'].dtype}) — a float "
                "transform over a compact-wire dataset would be silently "
                "integer-truncated"
            )
    # compact-wire datasets emit uint8 RGB / int8 count voxels (normalization
    # runs on device, eval/detections.py make_inference_fn wire='compact');
    # preserving the sample dtype keeps the batch 4x smaller over the wire
    events = np.zeros((bsz, h, w, ev_c), dtype=samples[0]["event"].dtype)
    rgbs = np.zeros((bsz, h, w, 3), dtype=samples[0]["rgb"].dtype)
    annots = np.full((bsz, max_annots, 5), -1.0, dtype=np.float32)
    mask = np.zeros((bsz,), dtype=bool)

    for i, s in enumerate(samples):
        e, r = s["event"], s["rgb"]
        events[i, : e.shape[0], : e.shape[1], :] = e[:h, :w]
        rgbs[i, : r.shape[0], : r.shape[1], :] = r[:h, :w]
        a = s["annot"]
        k = min(len(a), max_annots)
        if k:
            annots[i, :k] = a[:k]
        mask[i] = True

    return {"event": events, "rgb": rgbs, "annot": annots, "sample_mask": mask}
