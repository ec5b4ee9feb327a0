"""Offline detector-on-folder visualizer (replaces visulize_fusion.py).

Runs the detector over a CSV dataset and writes side-by-side RGB/event panels
with per-class colored boxes at score > 0.5.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from frn_tpu.cli.common import (
    add_dataset_args,
    add_model_args,
    build_config,
    build_csv_dataset,
    load_checkpoint_into_state,
)


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Visualize detections")
    add_dataset_args(p, train=False)
    add_model_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output_dir", default="./visualizations")
    p.add_argument("--score_threshold", type=float, default=0.5)
    p.add_argument("--max_images", type=int, default=50)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    from frn_tpu.cli.common import setup_runtime

    setup_runtime()
    if args.csv_test is None:
        raise SystemExit("--csv_test is required")

    dataset = build_csv_dataset(args, args.csv_test)
    config = build_config(args, dataset.num_classes(), 1)

    from frn_tpu.eval import make_inference_fn
    from frn_tpu.train.loop import create_train_state
    from frn_tpu.utils.visualization import save_detection_panel

    model, state, _ = create_train_state(config, jax.random.PRNGKey(0), batch_size=1)
    state, _ = load_checkpoint_into_state(args, config, state)
    infer = make_inference_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats}, config
    )

    names = [dataset.label_to_name(i) for i in range(dataset.num_classes())]
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(len(dataset), args.max_images)):
        raw_rgb = dataset.load_rgb(i)  # un-normalized for display
        sample = dataset[i]
        scores, labels, boxes = infer(
            sample["rgb"][None], sample["event"][None]
        )
        save_detection_panel(
            os.path.join(args.output_dir, f"{i:06d}.png"),
            raw_rgb, sample["event"],
            np.asarray(boxes[0]), np.asarray(labels[0]), np.asarray(scores[0]),
            class_names=names, score_threshold=args.score_threshold,
        )
    print(f"wrote {min(len(dataset), args.max_images)} panels to {args.output_dir}")


if __name__ == "__main__":
    main()
