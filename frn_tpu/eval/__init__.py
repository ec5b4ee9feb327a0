from frn_tpu.eval.ap import (
    average_precisions,
    compute_ap,
    compute_overlap,
    evaluate_coco_map,
    evaluate_voc,
    summarize_coco,
)
from frn_tpu.eval.detections import (
    collect_annotations,
    collect_detections,
    make_inference_fn,
)
from frn_tpu.eval.coco_protocol import evaluate_coco, evaluate_coco_protocol
from frn_tpu.eval.evaluator import CorruptedDataset, EvalResult, corruption_sweep, evaluate_dataset

__all__ = [
    "average_precisions",
    "compute_ap",
    "compute_overlap",
    "evaluate_coco_map",
    "evaluate_voc",
    "summarize_coco",
    "collect_annotations",
    "collect_detections",
    "make_inference_fn",
    "evaluate_coco",
    "evaluate_coco_protocol",
    "CorruptedDataset",
    "EvalResult",
    "corruption_sweep",
    "evaluate_dataset",
]
