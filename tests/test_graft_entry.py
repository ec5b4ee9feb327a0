"""Driver-contract tests: entry() structure and dryrun_multichip on the CPU mesh."""

import sys

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8(capsys):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    assert "OK" in capsys.readouterr().out


def test_preprocess_tool(tmp_path):
    from frn_tpu.data.synthetic import make_dsec_det_fixture

    import dataclasses

    from frn_tpu.config import DSEC

    tiny = dataclasses.replace(DSEC, height=64, width=96)
    root = tmp_path / "raw"
    make_dsec_det_fixture(str(root), num_sequences=1, frames_per_sequence=3, geometry=tiny)

    sys.path.insert(0, "/root/repo/tools")
    from tools.preprocess_dsec import main

    out = tmp_path / "npz"
    main([
        "--dataset_root", str(root), "--output", str(out),
        "--time_window_ms", "100", "--height", "64", "--width", "96",
    ])
    files = sorted(out.rglob("*.npz"))
    assert len(files) == 3
    arr = np.load(str(files[1]))["arr_0"]
    assert arr.shape == (5, 64, 96)
    assert np.abs(arr).sum() > 0
