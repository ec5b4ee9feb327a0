"""End-to-end training epoch rate on the real chip: loader + step overlap.

bench_train.py measures the bare jitted step on device-resident batches; a
real epoch also pays host-side loading (png decode + h5 slice + voxelize) and
the host->device wire. This drives the REAL trainer (cli/train_dsec_det_fast
-> train/trainer.py) over a synthetic raw-DSEC fixture for both input wires
and reports steady-state img/s (last epoch; first epoch carries the compile).

NOTE this dev VM has ONE CPU core (CLAUDE.md): loader threads cannot scale
here, so the number is a HOST-bound floor for hosted-TPU training on this VM,
not the design's ceiling on a production multi-core host.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_epoch.py \
      [--batch 8] [--epochs 3] [--frames 24] [--wires compact,f32]
"""

import argparse
import json
import re
import subprocess
import sys
import tempfile
import time


def run_epochs(fixture, batch, epochs, wire, env_extra=None):
    import os

    cmd = [
        sys.executable, "-m", "frn_tpu.cli.train_dsec_det_fast",
        "--dataset_root", fixture, "--batch_size", str(batch),
        "--epochs", str(epochs), "--wire", wire,
        "--checkpoint_dir", tempfile.mkdtemp(prefix="bench_epoch_ckpt_"),
    ]
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=5400)
    wall = time.perf_counter() - t0
    times = [float(m) for m in re.findall(r"\((\d+\.\d+)s\)", proc.stdout)]
    if proc.returncode != 0 or not times:
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"trainer failed (rc {proc.returncode})")
    return times, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--sequences", type=int, default=2)
    ap.add_argument("--frames", type=int, default=24, help="frames per sequence")
    ap.add_argument("--wires", default="compact,f32")
    args = ap.parse_args()

    from frn_tpu.data.dsec_det import DSECDetDataset
    from frn_tpu.data.synthetic import make_dsec_det_fixture

    fixture = tempfile.mkdtemp(prefix="bench_epoch_fix_")
    make_dsec_det_fixture(fixture, num_sequences=args.sequences,
                          frames_per_sequence=args.frames, seed=0)
    n_imgs = len(DSECDetDataset(fixture, split="train"))

    results = {}
    for wire in args.wires.split(","):
        times, wall = run_epochs(fixture, args.batch, args.epochs, wire)
        steady = times[-1]
        results[wire] = {
            "epoch_s": [round(t, 1) for t in times],
            "steady_img_s": round(n_imgs / steady, 2),
            "total_wall_s": round(wall, 1),
        }
        print(f"[{wire}] epochs {results[wire]['epoch_s']} -> "
              f"{results[wire]['steady_img_s']} img/s", file=sys.stderr,
              flush=True)

    print(json.dumps({
        "metric": "dsec_det_train_epoch_img_s",
        "unit": "img/s",
        "batch": args.batch,
        "images_per_epoch": n_imgs,
        "per_wire": results,
    }))


if __name__ == "__main__":
    main()
