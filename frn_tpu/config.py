"""Typed configuration tree for the whole framework.

Replaces the reference's per-script argparse defaults and string-keyed dataset
branching (reference: train_dsec.py:35-52, model.py:47-56, dataloader.py:459-534)
with one dataclass tree. Every geometry-dependent constant lives here so that model
code is shape-polymorphic and trace-time static.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """RetinaNet anchor grid. Reference: retinanet/anchors.py:6-45.

    pyramid levels [2..6] -> strides [4,8,16,32,64], base sizes [16,32,64,128,256],
    3 ratios x 3 scales = 9 anchors per cell.
    """

    pyramid_levels: Tuple[int, ...] = (2, 3, 4, 5, 6)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    scales: Tuple[float, ...] = (1.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0))

    @property
    def strides(self) -> Tuple[int, ...]:
        return tuple(2 ** lvl for lvl in self.pyramid_levels)

    @property
    def sizes(self) -> Tuple[int, ...]:
        return tuple(2 ** (lvl + 2) for lvl in self.pyramid_levels)

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.ratios) * len(self.scales)


@dataclasses.dataclass(frozen=True)
class BoxCoderConfig:
    """Box delta normalization. Reference: retinanet/utils.py:103-126, losses.py:141-152."""

    mean: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    std: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)


@dataclasses.dataclass(frozen=True)
class DatasetGeometry:
    """Per-benchmark geometry and normalization constants.

    Reference: model.py:47-56 (FPN upsampling mode), dataloader.py:452-534
    (Normalizer/Resizer constants), dsec_data.py:252-254.
    """

    name: str  # 'dsec' | 'ddd17'
    height: int
    width: int
    num_classes: int
    class_names: Tuple[str, ...]
    rgb_mean: Tuple[float, float, float]
    rgb_std: Tuple[float, float, float]
    event_channels: int = 5
    # 'nearest2x' (DSEC: divisible-by-32 sizes) or 'bilinear_fixed' (DDD17: 346x260
    # is not divisible, so the reference upsamples to the exact coarser-level shape).
    fpn_upsample: str = "nearest2x"

    def level_shape(self, level: int) -> Tuple[int, int]:
        """Feature-map shape at a pyramid level (ceil division, anchors.py:30)."""
        s = 2 ** level
        return (math.ceil(self.height / s), math.ceil(self.width / s))


DSEC = DatasetGeometry(
    name="dsec",
    height=480,
    width=640,
    num_classes=3,
    class_names=("person", "large_vehicle", "car"),
    rgb_mean=(0.485, 0.456, 0.406),
    rgb_std=(0.229, 0.224, 0.225),
    fpn_upsample="nearest2x",
)

DDD17 = DatasetGeometry(
    name="ddd17",
    height=260,
    width=346,
    num_classes=1,
    class_names=("car",),
    rgb_mean=(0.403, 0.403, 0.403),
    rgb_std=(0.295, 0.295, 0.295),
    fpn_upsample="bilinear_fixed",
)

# Raw DSEC-Det pipeline (dsec_data.py:151-152): two classes, same geometry as DSEC.
DSEC_DET = dataclasses.replace(
    DSEC, num_classes=2, class_names=("car", "pedestrian")
)


def geometry_for(name: str) -> DatasetGeometry:
    try:
        return {"dsec": DSEC, "ddd17": DDD17, "dsec_det": DSEC_DET}[name]
    except KeyError:
        raise ValueError(f"Unknown dataset geometry: {name!r}") from None


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Detector assembly. Reference: retinanet/model.py:690-701 factory."""

    variant: str = "fusion"  # 'fusion' | 'rgb' | 'event'
    depth: int = 50  # 18 | 34 | 50
    num_classes: int = 3
    feature_size: int = 256
    prior: float = 0.01  # classification prior bias init (model.py:237-243)
    modality_dropout: float = 0.15  # p of zeroing RGB during fusion training (model.py:279)
    # Compute dtype for backbone/heads. Params stay f32; bf16 activations use the MXU
    # at full rate on TPU. Attention softmax and loss always run in f32.
    compute_dtype: str = "float32"
    attention_chunk: int = 1024  # query-block size for flash cross-attention
    # Run both head towers as one grouped-conv chain per pyramid level
    # (heads.fused_dual_heads). Measured-and-REJECTED as the default on v5e:
    # isolated 5-level probe wins 13.2 vs 14.9 ms @ b8, but the full graph
    # measures 135.8 vs 138.3 img/s @ b16 (tools/probe_heads2.py vs bench.py) —
    # the isolated win does not transfer (layout negotiation with the
    # surrounding graph). Kept exact + tested for other geometries/hardware.
    fused_heads: bool = False
    # Evaluate backbone stems with the Pallas implicit-GEMM kernel
    # (ops/stem.py) instead of XLA's tiny-input-channel conv lowering.
    # Inference-path only (the Pallas call defines no VJP); training uses the
    # XLA stem regardless.
    stem_kernel: bool = False
    # Compute the flash-attention softmax weights' exp on bf16 (s - m) tiles —
    # half the VPU vector width per transcendental; dominant weights see only
    # bf16 roundoff (tests/test_flash_attention.py). Inference-path only (the
    # bf16-exp forward defines no VJP); training always uses the f32-exp kernel.
    flash_exp_bf16: bool = False
    # int8 attention serving mode (inference-path only; training always runs
    # the bf16/f32 kernel). The v5e MXU runs int8 at 2x the bf16 rate and the
    # d=32 attention geometry is padded-FLOP bound on both matmuls
    # (PARITY.md speed-of-light), so int8 halves the structural floor.
    # Dynamic per-slice quantization, no calibration data needed:
    #   'int8_qk'  QK^T on the int8 MXU path (softmax weights + PV bf16-exact)
    #   'int8'     QK^T and PV both int8 (softmax weights round to 1/127 steps)
    # None (default) = exact bf16 kernel; parity/record runs keep the default.
    attention_quant: Optional[str] = None
    # Fuse each stage's two cross-attention directions: the six C->C/8
    # projection convs become two C->3C/8 convs (one per stream — 96 of 128
    # MXU output lanes live instead of 32), both directions run as ONE flash
    # kernel call batched on the grid dim (2B), and the two W back-projections
    # become one batched matmul. Numerically identical to the sequential path
    # (same params, concatenated weight columns; per-batch-independent kernel);
    # exactness pinned in tests/test_models.py.
    fused_attention: bool = False

    @property
    def block_layers(self) -> Tuple[int, ...]:
        return {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}[self.depth]

    @property
    def bottleneck(self) -> bool:
        return self.depth >= 50


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Inference postprocess + evaluation. Reference: model.py:326-364, csv_eval.py:66-131."""

    score_threshold: float = 0.05
    nms_iou: float = 0.5
    max_detections: int = 100
    # Static per-class candidate pool fed to on-device NMS (dynamic-shape masking in
    # the reference becomes fixed-size top-k on TPU).
    per_class_topk: int = 400
    # TPU-optimized approximate candidate selection (recall 0.997 @ k=400/230k
    # anchors, 3.5x faster than exact sort); False = exact lax.top_k.
    approx_topk: bool = True
    # Exact-pool algorithm when approx_topk=False (both provably == lax.top_k,
    # tie order included — tests/test_nms_delta.py):
    #   'two_stage'  per-block lax.top_k then top-k of block winners
    #   'radix'      bit-prefix threshold select (core/nms.radix_select_topk) —
    #                bandwidth-bound counting passes instead of block sorts
    exact_pool: str = "two_stage"
    # Postprocess pipeline shape (all produce the same detections; see
    # core/nms.py pooled_class_aware_nms for the exactness argument):
    #   'dense'           decode+clip all anchors, then NMS (reference order)
    #   'pooled'          per-class score top-k first, decode only the pool
    #   'pooled_logits'   + heads emit bf16 logits, sigmoid deferred past top-k
    #   'pooled_chanlast' + classification emitted class-major (B, K, A)
    # Default is the full-graph A/B winner on v5e (tools/bench_fastpath.py,
    # b16 DSEC fusion): pooled_chanlast 144.0/137.2 img/s (approx/exact) vs
    # dense 138.0/128.1; pooled and pooled_logits alone measured no win —
    # the class-major emission that skips the (A, K)->(K, A) narrow-minor
    # transpose is what pays. Model calls must pass
    # eval_output=eval_output_for(config) (models/detector.py).
    postprocess: str = "pooled_chanlast"
    # With postprocess='pooled_chanlast': regression rides to the decode as the
    # FREE (B, HW, A*4) flatten of the NHWC head maps instead of the (B, HWA, 4)
    # rows relayout (0.64 ms/step @ b16 DSEC in the round-5 device trace); the
    # pooled decode gathers each candidate's 4-delta slot directly
    # (core/nms.py pooled_class_aware_nms — bitwise identical deltas).
    # Default ON: full-graph A/B 155.31/155.4 vs 154.69 img/s (v5e 2026-08-21,
    # tools/bench_fastpath.py --only pooled_chanlast,reg36 + probe_input_layout
    # FRN_PROBE_REG36=1). Only consulted when postprocess='pooled_chanlast'.
    reg_flat36: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters. Reference: train_dsec.py:122-163, train_ddd17.py:83-201."""

    batch_size: int = 2
    learning_rate: float = 1e-4
    grad_clip_norm: float = 0.1
    accum_steps: int = 2  # optimizer step every N micro-batches (train_dsec.py:160-163)
    epochs: int = 60
    # ReduceLROnPlateau(patience=3), torch defaults factor=0.1 (train_dsec.py:124)
    plateau_patience: int = 3
    plateau_factor: float = 0.1
    checkpoint_every: int = 5
    max_annots_per_image: int = 64  # static annotation padding
    # Skip (zero-grad) steps whose loss exceeds this (train_dsec_det_fast.py:256-258
    # uses 50). None = only non-finite losses are skipped (the canonical trainers
    # train_dsec.py/train_ddd17.py have no magnitude guard); a finite threshold can
    # permanently freeze from-scratch training where early losses are legitimately
    # large (e.g. under RGB modality dropout at random init).
    loss_skip_threshold: Optional[float] = None
    # Linear LR warmup over the first N optimizer steps. 0 = reference recipe
    # (reference workflows always start from pretrained weights; from-scratch
    # training needs warmup because the first full-size Adam step saturates the
    # zero-init classification head).
    warmup_steps: int = 0
    seed: int = 0
    # Host->device batch wire format (mirrors eval's make_inference_fn wire=):
    #   'f32'     — host-normalized float32 tensors (reference pipeline).
    #   'compact' — uint8 RGB + int8 raw-count voxels from a
    #               compact_wire=True dataset; /255 (+standardization iff
    #               input_rgb_standardize) and the conditional tanh squash run
    #               inside the jitted train step. 4x fewer input bytes per
    #               batch — frees host CPU + input-link bandwidth for loaders.
    input_wire: str = "f32"
    input_rgb_standardize: bool = False


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    geometry: DatasetGeometry = DSEC
    anchors: AnchorConfig = AnchorConfig()
    box_coder: BoxCoderConfig = BoxCoderConfig()
    model: ModelConfig = ModelConfig()
    eval: EvalConfig = EvalConfig()
    train: TrainConfig = TrainConfig()

    @staticmethod
    def for_dataset(name: str, variant: str = "fusion", **model_kw) -> "FrameworkConfig":
        geo = geometry_for(name)
        return FrameworkConfig(
            geometry=geo,
            model=ModelConfig(variant=variant, num_classes=geo.num_classes, **model_kw),
        )
