"""Input-pipeline throughput: raw DSEC-Det sequences -> fixed-shape batches.

Measures the host-side path (h5 window reads -> native voxelization -> collate)
that must outrun device compute (~100 img/s inference on one v5e). Uses a
synthetic raw fixture with a realistic event density unless --dataset_root is
given.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--events_per_window", type=int, default=500_000)
    p.add_argument("--frames", type=int, default=48)
    args = p.parse_args(argv)

    from frn_tpu.config import DSEC_DET
    from frn_tpu.data.dsec_det import DSECDetDataset
    from frn_tpu.data.loader import BatchLoader

    root = args.dataset_root
    if root is None:
        import tempfile

        from frn_tpu.data.events import write_event_h5
        from frn_tpu.data.synthetic import make_dsec_det_fixture

        root = tempfile.mkdtemp(prefix="frn_pipe_bench_")
        make_dsec_det_fixture(root, num_sequences=1, frames_per_sequence=args.frames)
        # replace the sparse fixture events with a realistic-density stream
        rng = np.random.default_rng(0)
        seq = os.path.join(root, "synthetic_00")
        n = args.events_per_window * args.frames // 10  # windows overlap 10x
        t0, dt = 10_000_000, 100_000
        t = np.sort(rng.integers(t0 - dt, t0 + args.frames * dt, n)).astype(np.int64)
        write_event_h5(
            os.path.join(seq, "events/left/events_2x.h5"),
            rng.integers(0, 640, n).astype(np.uint16),
            rng.integers(0, 480, n).astype(np.uint16),
            t, rng.integers(0, 2, n).astype(np.uint8),
            t_offset=t0 - dt,
        )
        print(f"synthetic fixture: {n/1e6:.1f} M events, {args.frames} frames")

    ds = DSECDetDataset(root, geometry=DSEC_DET, time_window_us=1_000_000)
    print(f"dataset: {len(ds)} samples")
    loader = BatchLoader(
        ds, DSEC_DET, batch_size=args.batch_size, num_threads=args.threads,
        max_annots=64,
    )

    # warm one epoch for file caches, then measure
    n_img = 0
    for b in loader:
        n_img += int(b["sample_mask"].sum())
    t0 = time.perf_counter()
    n_img = 0
    for b in loader:
        n_img += int(b["sample_mask"].sum())
    dt = time.perf_counter() - t0
    print(
        f"pipeline: {n_img} images in {dt:.2f}s -> {n_img/dt:.1f} img/s "
        f"({args.threads} threads, batch {args.batch_size}, {os.cpu_count()} host cores)"
    )
    # NOTE: per-sample work is ~50 ms (h5 read 12 + native voxelize 26 + image 9)
    # and parallelizes per sample (GIL released in the C scatter / h5 / cv2);
    # throughput scales with host cores. On a 1-core dev VM this prints the
    # single-core ceiling; production TPU hosts have >=100 cores. The on-device
    # voxelization path (ops/voxelize.voxelize_events) removes the scatter from
    # the host entirely when host cores are the bottleneck.


if __name__ == "__main__":
    main()
