"""Alias of frn_tpu.cli.test with DDD17 defaults (reference test_ddd17.py)."""
from frn_tpu.cli.test import main as _main

if __name__ == "__main__":
    import sys

    _main(["--dataset_name", "ddd17"] + sys.argv[1:])
