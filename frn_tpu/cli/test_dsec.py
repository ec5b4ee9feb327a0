"""Alias of frn_tpu.cli.test with DSEC defaults (reference test_dsec.py)."""
from frn_tpu.cli.test import main as _main

if __name__ == "__main__":
    import sys

    _main(["--dataset_name", "dsec"] + sys.argv[1:])
