"""Alias of frn_tpu.cli.train with DDD17 defaults (reference train_ddd17.py:
batch 4, 200 epochs, checkpoint every 10)."""
from frn_tpu.cli.train import main as _main

if __name__ == "__main__":
    import sys

    _main(
        ["--dataset_name", "ddd17", "--batch_size", "4", "--epochs", "200",
         "--checkpoint_every", "10"] + sys.argv[1:]
    )
