"""Alias of frn_tpu.cli.train with DSEC defaults (reference train_dsec.py)."""
from frn_tpu.cli.train import get_parser, main as _main


def main(argv=None):
    return _main((argv or []) if isinstance(argv, list) else argv)


if __name__ == "__main__":
    import sys

    _main(["--dataset_name", "dsec"] + sys.argv[1:])
