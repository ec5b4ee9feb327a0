from frn_tpu.models.detector import (
    FRNDetector,
    decode_detections,
    eval_output_for,
    detection_loss,
    image_anchors,
    init_detector,
)
from frn_tpu.models.fpn import PyramidFeatures
from frn_tpu.models.fusion import REFusion, CrossAttentionBlock, adain
from frn_tpu.models.heads import ClassificationHead, RegressionHead
from frn_tpu.models.resnet import ResNetBackbone

__all__ = [
    "FRNDetector",
    "decode_detections",
    "eval_output_for",
    "detection_loss",
    "image_anchors",
    "init_detector",
    "PyramidFeatures",
    "REFusion",
    "CrossAttentionBlock",
    "adain",
    "ClassificationHead",
    "RegressionHead",
    "ResNetBackbone",
]
