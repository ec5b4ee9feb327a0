"""Raw DSEC-Det evaluation entry point (replaces test_dsec_det.py).

Evaluates a checkpoint over raw DSEC-Det sequences with configurable event
representation (--event_representation voxel|time_surface|event_count|binary) and
event time window (--dt ms), per the reference's flags (test_dsec_det.py:65-66).
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from frn_tpu.cli.common import FUSION_TO_VARIANT, add_model_args, load_checkpoint_into_state


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate on raw DSEC-Det data")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--split_yaml", default=None)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument(
        "--event_representation", default="voxel",
        choices=["voxel", "time_surface", "event_count", "binary"],
    )
    p.add_argument("--dt", type=int, default=50, help="event window in ms")
    p.add_argument(
        "--wire", default="f32", choices=["f32", "compact"],
        help="host->device batch format: 'compact' ships uint8 RGB + int8 raw "
        "count voxels and normalizes on device (4x fewer input bytes; voxel "
        "representation only)",
    )
    add_model_args(p)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    from frn_tpu.cli.common import setup_runtime

    setup_runtime()

    from frn_tpu.config import DSEC_DET, FrameworkConfig, ModelConfig
    from frn_tpu.data.dsec_det import DSECDetDataset
    from frn_tpu.eval import evaluate_dataset, make_inference_fn
    from frn_tpu.train.loop import create_train_state

    dataset = DSECDetDataset(
        args.dataset_root, split=args.split, split_yaml=args.split_yaml,
        time_window_us=args.dt * 1000,
        event_representation=args.event_representation,
        compact_wire=args.wire == "compact",
    )
    config = FrameworkConfig(
        geometry=DSEC_DET,
        model=ModelConfig(
            variant=FUSION_TO_VARIANT[args.fusion], depth=args.depth,
            num_classes=dataset.num_classes(), compute_dtype=args.compute_dtype,
        ),
    )
    model, state, _ = create_train_state(config, jax.random.PRNGKey(0), batch_size=args.batch_size)
    state, _ = load_checkpoint_into_state(args, config, state)
    infer = make_inference_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats}, config,
        wire=args.wire, rgb_standardize=dataset.normalize_rgb,
    )
    res = evaluate_dataset(dataset, infer, config, batch_size=args.batch_size, verbose=True)
    print("fps", round(res.fps, 2))
    print(json.dumps({k: round(v, 4) for k, v in res.summary.items()}, indent=2))
    return res.summary["mAP"]


if __name__ == "__main__":
    main()
