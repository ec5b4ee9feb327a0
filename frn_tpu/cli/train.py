"""CSV-label training entry point (replaces train_dsec.py / train_ddd17.py).

  python -m frn_tpu.cli.train --dataset_name dsec  --epochs 60  ...   # train_dsec
  python -m frn_tpu.cli.train --dataset_name ddd17 --epochs 200 ...   # train_ddd17

Recipe per the reference: Adam lr 1e-4, grad clip 0.1, optimizer step every 2
micro-batches, ReduceLROnPlateau(patience 3) on mean epoch loss, checkpoint every
5 epochs (DSEC) / 10 (DDD17), p=0.15 RGB modality dropout in the fusion variant.
"""

from __future__ import annotations

import argparse

from frn_tpu.cli.common import (
    add_dataset_args,
    add_model_args,
    build_config,
    build_csv_dataset,
    load_checkpoint_into_state,
    make_eval_fn,
)


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the FRN-TPU detector on CSV labels")
    add_dataset_args(p, train=True)
    add_model_args(p)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--continue_training", action="store_true")
    p.add_argument("--checkpoint", default=None, help=".pt (torch) or orbax dir to load")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--checkpoint_every", type=int, default=5)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup steps (recommended when training from scratch)")
    p.add_argument("--plateau_patience", type=int, default=3,
                   help="ReduceLROnPlateau patience in epochs (reference default 3)")
    p.add_argument("--augment", action="store_true",
                   help="random horizontal flip of both modalities + boxes "
                   "(the reference defines an Augmenter, dataloader.py:498-519, "
                   "but never wires it into a trainer; off by default to match)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    from frn_tpu.cli.common import setup_runtime

    setup_runtime()

    dataset = build_csv_dataset(args, args.csv_train)
    config = build_config(args, dataset.num_classes(), args.batch_size, args.epochs)

    test_dataset = build_csv_dataset(args, args.csv_test) if args.csv_test else None
    eval_fn = make_eval_fn(args, config, test_dataset) if test_dataset else None

    from frn_tpu.train.trainer import Trainer

    transform = None
    if args.augment:
        from frn_tpu.data.transforms import horizontal_flip

        # rng=None -> fresh OS-seeded generator per call: loader transforms run
        # in threads and a shared numpy Generator is not thread-safe (the
        # reference Augmenter likewise draws from the global np.random state)
        transform = horizontal_flip

    trainer = Trainer(
        config, dataset,
        checkpoint_dir=args.checkpoint_dir,
        eval_fn=eval_fn,
        eval_every=args.eval_every,
        transform=transform,
    )
    if args.continue_training:
        if args.checkpoint:
            trainer.state, _ = load_checkpoint_into_state(args, config, trainer.state)
        else:
            trainer.resume()

    history = trainer.fit(args.epochs)
    print("final loss history:", [round(h, 4) for h in history[-5:]])
    return history


if __name__ == "__main__":
    main()
