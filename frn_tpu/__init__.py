"""frn_tpu — a TPU-native (JAX/XLA/Pallas) RGB + event-camera fusion detection framework.

Re-implements the capabilities of the FRN reference (ECCV 2024, "Embracing Events and
Frames with Hierarchical Feature Refinement Network for Robust Object Detection"):
dual-backbone RetinaNet with per-stage cross-modal fusion, event-stream voxelization,
DSEC / PKU-DDD17-Car benchmarks, corruption-robustness evaluation — redesigned for
TPU hardware (static shapes, fused on-device postprocessing, pjit data parallelism).

Layering (bottom-up):
  core/      pure jnp geometry + loss kernels (anchors, boxes, focal loss, NMS)
  ops/       event voxelization (host native + device), attention, upsampling
  models/    flax modules: ResNet-50 backbones, REFusion, FPN, RetinaNet heads
  data/      datasets (CSV, raw DSEC-Det), fixed-shape batching, device prefetch
  train/     optax training loop, orbax checkpointing
  eval/      batched detection extraction, VOC/COCO mAP, corruption sweeps
  parallel/  mesh + sharding helpers (DP over ICI)
  cli/       reference-compatible entry points
"""

__version__ = "0.1.0"
