"""Pre-voxelize DSEC event streams to .npz files for the CSV datasets.

The reference's CSV pipeline consumes pre-voxelized events (dataloader.py:114-119,
'arr_0' (C,H,W) npz per frame) but ships no generator for them. This tool produces
them from raw DSEC sequence directories using the native scatter kernel, at the
frame timestamps, with the reference's 1 s window and tanh normalization.

  python tools/preprocess_dsec.py --dataset_root /data/DSEC --output /data/events \
      --time_window_ms 1000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from frn_tpu.data.dsec_det import SequenceDirectory, _discover_sequences
from frn_tpu.ops.voxelize import normalize_event_voxel_np, voxelize_events_np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--time_window_ms", type=int, default=1000)
    p.add_argument("--num_bins", type=int, default=5)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args(argv)

    from pathlib import Path

    seq_paths = _discover_sequences(Path(args.dataset_root))
    total = 0
    for sp in seq_paths:
        seq = SequenceDirectory(sp)
        if not len(seq.timestamps):
            continue
        out_dir = os.path.join(args.output, seq.name, "left")
        os.makedirs(out_dir, exist_ok=True)
        for i, ts in enumerate(seq.timestamps):
            ev = seq.events.window(int(ts) - args.time_window_ms * 1000, int(ts))
            voxel = voxelize_events_np(
                ev["x"].astype(np.int64), ev["y"].astype(np.int64), ev["t"], ev["p"],
                num_bins=args.num_bins, height=args.height, width=args.width,
            )
            voxel = normalize_event_voxel_np(voxel)
            np.savez_compressed(os.path.join(out_dir, f"{i:06d}.npz"), voxel)
            total += 1
        print(f"{seq.name}: {len(seq.timestamps)} frames")
    print(f"wrote {total} voxel files to {args.output}")


if __name__ == "__main__":
    main()
