"""Shared CLI plumbing for the reference-compatible entry points.

Flag names mirror the reference scripts (train_dsec.py:35-52, test_dsec.py:60-84)
minus the hard-coded absolute default paths: paths are required flags here.
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax

from frn_tpu.config import FrameworkConfig, ModelConfig, TrainConfig, geometry_for

FUSION_TO_VARIANT = {"fpn_fusion": "fusion", "rgb": "rgb", "event": "event"}


def setup_runtime() -> None:
    """Per-entry-point runtime setup: persistent XLA compilation cache."""
    from frn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def add_dataset_args(p: argparse.ArgumentParser, train: bool) -> None:
    p.add_argument("--dataset_name", default="dsec", choices=["dsec", "ddd17"])
    p.add_argument("--csv_classes", required=True, help="class list CSV (name,id)")
    if train:
        p.add_argument("--csv_train", required=True, help="training annotations CSV")
        p.add_argument("--csv_val", default=None, help="validation annotations CSV")
    p.add_argument("--csv_test", default=None, help="test annotations CSV")
    p.add_argument("--root_img", required=True, help="root dir of RGB images")
    p.add_argument("--root_event", required=True, help="root dir of event files")
    p.add_argument("--event_type", default="voxel", choices=["voxel", "gray"])
    p.add_argument(
        "--path_schema", default="event_keyed", choices=["event_keyed", "rgb_keyed"],
        help="CSV key layout: event-file keyed (dataloader.py) or RGB-path keyed "
        "(dataloader_rgb.py:113-126)",
    )
    # geometry overrides (off-benchmark resolutions, fast smoke runs)
    p.add_argument("--image_height", type=int, default=None)
    p.add_argument("--image_width", type=int, default=None)


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--fusion", default="fpn_fusion", choices=list(FUSION_TO_VARIANT))
    p.add_argument("--depth", type=int, default=50, choices=[18, 34, 50])
    p.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--feature_size", type=int, default=256)
    p.add_argument(
        "--attention_quant", default=None, choices=["int8_qk", "int8"],
        help="int8 attention serving mode (inference only; TPU MXU 2x rate). "
        "Default off = exact bf16 kernel; agreement/mAP deltas measured in "
        "tools/bench_int8.py and tools/run_int8_map_delta.sh.",
    )


def geometry_from_args(args, num_classes: Optional[int] = None):
    import dataclasses

    geo = geometry_for(args.dataset_name)
    if num_classes is not None and num_classes != geo.num_classes:
        geo = dataclasses.replace(
            geo, num_classes=num_classes,
            class_names=tuple(str(i) for i in range(num_classes)),
        )
    if getattr(args, "event_type", "voxel") == "gray":
        # e2vid grayscale reconstructions are single-channel (dataloader.py:306-319)
        geo = dataclasses.replace(geo, event_channels=1)
    if getattr(args, "image_height", None) or getattr(args, "image_width", None):
        geo = dataclasses.replace(
            geo,
            height=args.image_height or geo.height,
            width=args.image_width or geo.width,
        )
    return geo


def build_config(args, num_classes: int, batch_size: int, epochs: Optional[int] = None) -> FrameworkConfig:
    geo = geometry_from_args(args, num_classes)
    return FrameworkConfig(
        geometry=geo,
        model=ModelConfig(
            variant=FUSION_TO_VARIANT[args.fusion],
            depth=args.depth,
            num_classes=num_classes,
            compute_dtype=args.compute_dtype,
            feature_size=getattr(args, "feature_size", 256),
            attention_quant=getattr(args, "attention_quant", None),
        ),
        train=TrainConfig(
            batch_size=batch_size,
            learning_rate=getattr(args, "lr", 1e-4),
            epochs=epochs or getattr(args, "epochs", 60),
            warmup_steps=getattr(args, "warmup_steps", 0),
            plateau_patience=getattr(args, "plateau_patience", 3),
        ),
    )


def build_csv_dataset(args, split_csv: str):
    from frn_tpu.data.csv_dataset import CSVDetectionDataset

    return CSVDetectionDataset(
        geometry=geometry_from_args(args),
        annotations_csv=split_csv,
        class_map_csv=args.csv_classes,
        event_dir=args.root_event,
        img_dir=args.root_img,
        event_type=args.event_type,
        path_schema=getattr(args, "path_schema", "event_keyed"),
    )


def load_checkpoint_into_state(args, config, state):
    """Load either an orbax directory or a torch .pt checkpoint into TrainState."""
    path = args.checkpoint
    if path is None:
        return state, {}
    if path.endswith(".pt") or path.endswith(".pth"):
        from frn_tpu.convert.torch_import import convert_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        template = {"params": state.params, "batch_stats": state.batch_stats}
        converted = convert_state_dict(sd, template, variant=config.model.variant)
        state = state.replace(
            params=converted["params"], batch_stats=converted["batch_stats"]
        )
        return state, {}
    from frn_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(path)
    state, meta = mgr.restore(state)
    mgr.close()
    return state, meta


def make_eval_fn(args, config, test_dataset):
    """Periodic-eval callback for the Trainer: returns mAP@[.5:.95]."""
    from frn_tpu.eval import evaluate_dataset, make_inference_fn

    # derive the wire from the dataset rather than assuming f32: a
    # compact_wire val dataset fed to a f32 inference fn would silently
    # report near-zero mAP mid-training (the dtype guard in make_inference_fn
    # now also rejects it loudly)
    wire = "compact" if getattr(test_dataset, "compact_wire", False) else "f32"
    rgb_standardize = bool(getattr(test_dataset, "normalize_rgb", False)) and (
        wire == "compact"
    )

    def eval_fn(model, state):
        infer = make_inference_fn(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            config,
            wire=wire,
            rgb_standardize=rgb_standardize,
        )
        res = evaluate_dataset(test_dataset, infer, config, batch_size=8)
        return res.summary["mAP"]

    return eval_fn
