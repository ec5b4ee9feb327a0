from frn_tpu.core.anchors import anchors_for_shape, generate_base_anchors, level_shapes
from frn_tpu.core.boxes import clip_boxes, decode_boxes, encode_boxes, pairwise_iou
from frn_tpu.core.losses import focal_detection_loss
from frn_tpu.core.nms import batched_detection_postprocess, class_aware_nms

__all__ = [
    "anchors_for_shape",
    "generate_base_anchors",
    "level_shapes",
    "pairwise_iou",
    "encode_boxes",
    "decode_boxes",
    "clip_boxes",
    "focal_detection_loss",
    "class_aware_nms",
    "batched_detection_postprocess",
]
