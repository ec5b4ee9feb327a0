"""Raw-DSEC training entry point (replaces train_dsec_det_fast.py).

Trains directly from DSEC-Det sequence directories (event h5 + tracks.npy), with
the reference recipe: Adam lr 5e-5, grad clip 1.0, plateau factor 0.5, safe-step
guards (NaN/Inf + loss>50 skip), eval + best-mAP checkpoint every 5 epochs.
"""

from __future__ import annotations

import argparse
import dataclasses

from frn_tpu.cli.common import FUSION_TO_VARIANT, add_model_args


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train on raw DSEC-Det data")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--split_yaml", default=None, help="sequence split config")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--time_window_us", type=int, default=1_000_000)
    p.add_argument("--checkpoint_dir", default="./checkpoints_dsec_det")
    p.add_argument("--continue_training", action="store_true")
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--debug_data", action="store_true", help="inspect 5 batches and exit")
    p.add_argument(
        "--wire", default="f32", choices=["f32", "compact", "events"],
        help="host->device batch format: 'compact' ships uint8 RGB + int8 raw "
        "count voxels and normalizes inside the jitted train step (4x fewer "
        "input bytes, less host CPU per batch); 'events' ships the raw x/y/t/p "
        "streams and voxelizes ON DEVICE (zero host voxelization CPU — the "
        "loader escape hatch on host-core-bound machines)",
    )
    p.add_argument(
        "--event_capacity", type=int, default=65536,
        help="'events' wire: static event slots per sample (windows beyond "
        "capacity keep their first N events)",
    )
    add_model_args(p)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    from frn_tpu.cli.common import setup_runtime

    setup_runtime()

    from frn_tpu.config import DSEC_DET, FrameworkConfig, ModelConfig, TrainConfig
    from frn_tpu.data.dsec_det import DSECDetDataset

    train_ds = DSECDetDataset(
        args.dataset_root, split="train", split_yaml=args.split_yaml,
        time_window_us=args.time_window_us,
        compact_wire=args.wire == "compact",
        events_wire=args.wire == "events",
        event_capacity=args.event_capacity,
    )
    config = FrameworkConfig(
        geometry=DSEC_DET,
        model=ModelConfig(
            variant=FUSION_TO_VARIANT[args.fusion], depth=args.depth,
            num_classes=train_ds.num_classes(), compute_dtype=args.compute_dtype,
        ),
        train=TrainConfig(
            batch_size=args.batch_size, learning_rate=args.lr,
            grad_clip_norm=1.0, accum_steps=1, epochs=args.epochs,
            plateau_factor=0.5,
            loss_skip_threshold=50.0,  # fast-trainer guard (train_dsec_det_fast.py:256)
            input_wire=args.wire,
            input_rgb_standardize=train_ds.normalize_rgb,
        ),
    )

    if args.debug_data:
        from frn_tpu.data.loader import BatchLoader
        import numpy as np

        loader = BatchLoader(train_ds, config.geometry, batch_size=args.batch_size)
        for i, batch in enumerate(loader):
            if i >= 5:
                break
            rgb, ann = batch["rgb"], batch["annot"]
            if args.wire == "events":
                ev_desc = (
                    f"events n={batch['event_n'].tolist()} "
                    f"cap={batch['event_x'].shape[1]}"
                )
            else:
                ev = batch["event"]
                ev_desc = f"event {ev.shape} [{ev.min():.3f},{ev.max():.3f}]"
            print(
                f"batch {i}: {ev_desc} "
                f"rgb {rgb.shape} [{rgb.min():.3f},{rgb.max():.3f}] "
                f"valid annots {(ann[..., 4] >= 0).sum()}"
            )
        return 0

    eval_fn = None
    if args.split_yaml:
        val_ds = DSECDetDataset(
            args.dataset_root, split="val", split_yaml=args.split_yaml,
            time_window_us=args.time_window_us,
        )
        if len(val_ds):
            from frn_tpu.cli.common import make_eval_fn

            eval_fn = make_eval_fn(args, config, val_ds)

    from frn_tpu.train.trainer import Trainer

    trainer = Trainer(
        config, train_ds, checkpoint_dir=args.checkpoint_dir,
        eval_fn=eval_fn, eval_every=args.eval_every,
    )
    if args.continue_training:
        trainer.resume()
    return trainer.fit(args.epochs)


if __name__ == "__main__":
    main()
