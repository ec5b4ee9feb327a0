"""Convert a reference PyTorch checkpoint to an orbax checkpoint.

  python -m frn_tpu.cli.convert_checkpoint --torch_checkpoint best.pt \
      --output ./ckpt_converted --dataset_name dsec --fusion fpn_fusion
"""

from __future__ import annotations

import argparse

import jax

from frn_tpu.cli.common import FUSION_TO_VARIANT
from frn_tpu.config import FrameworkConfig, ModelConfig, geometry_for


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--dataset_name", default="dsec", choices=["dsec", "ddd17", "dsec_det"])
    p.add_argument("--fusion", default="fpn_fusion", choices=list(FUSION_TO_VARIANT))
    p.add_argument("--depth", type=int, default=50)
    args = p.parse_args(argv)

    from frn_tpu.cli.common import setup_runtime

    setup_runtime()

    from frn_tpu.convert.torch_import import convert_state_dict, load_torch_checkpoint
    from frn_tpu.train.checkpoint import CheckpointManager
    from frn_tpu.train.loop import create_train_state

    geo = geometry_for(args.dataset_name)
    config = FrameworkConfig(
        geometry=geo,
        model=ModelConfig(
            variant=FUSION_TO_VARIANT[args.fusion], depth=args.depth,
            num_classes=geo.num_classes,
        ),
    )
    _, state, _ = create_train_state(config, jax.random.PRNGKey(0))

    sd = load_torch_checkpoint(args.torch_checkpoint)
    converted = convert_state_dict(
        sd, {"params": state.params, "batch_stats": state.batch_stats},
        variant=config.model.variant,
    )
    if converted["_unused_torch_keys"]:
        print(f"warning: {len(converted['_unused_torch_keys'])} unused torch keys, "
              f"e.g. {converted['_unused_torch_keys'][:5]}")
    state = state.replace(params=converted["params"], batch_stats=converted["batch_stats"])

    mgr = CheckpointManager(args.output)
    mgr.save(epoch=0, state=jax.device_get(state), meta={"source": args.torch_checkpoint})
    mgr.close()
    print(f"wrote orbax checkpoint to {args.output}")


if __name__ == "__main__":
    main()
