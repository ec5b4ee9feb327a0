"""Streaming-eval input-wire benchmark on the real chip: f32 vs compact.

bench.py measures the compute path on device-resident inputs; real record runs
(cli/test.py / cli/test_dsec_det.py) stream every batch from the host, so on a
hosted TPU they are bound by the host->device link (CLAUDE.md: fresh numpy args
re-upload on EVERY jit call; the axon relay moves incompressible data at
~35-45 MB/s). This tool measures that streaming path end-to-end through
eval/detections.make_inference_fn for both wire formats:

  f32     — host-normalized float32 batches (9.8 MB/img at DSEC geometry)
  compact — uint8 RGB + int8 count voxels, device-normalized (2.45 MB/img)

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_eval_wire.py

Env knobs:
  FRN_WIRE_BATCH=16       batch size
  FRN_WIRE_ITERS_F32=6    measured batches for the f32 wire (it is ~4x slower)
  FRN_WIRE_ITERS_U8=16    measured batches for the compact wire
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

BATCH = int(os.environ.get("FRN_WIRE_BATCH", "16"))
ITERS_F32 = int(os.environ.get("FRN_WIRE_ITERS_F32", "6"))
ITERS_U8 = int(os.environ.get("FRN_WIRE_ITERS_U8", "16"))


def main():
    from frn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.eval.detections import make_inference_fn
    from frn_tpu.models.detector import init_detector

    cfg = FrameworkConfig(
        geometry=DSEC,
        model=ModelConfig(
            variant="fusion", depth=50, num_classes=3, compute_dtype="bfloat16"
        ),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), batch_size=1)
    geo = cfg.geometry
    rng = np.random.default_rng(0)

    def make_batches(wire, n=4):
        """Rotation of distinct INCOMPRESSIBLE host batches (zeros compress on
        the relay and lie about the wire)."""
        out = []
        for _ in range(n):
            if wire == "compact":
                rgb = rng.integers(
                    0, 256, (BATCH, geo.height, geo.width, 3), dtype=np.uint8
                )
                ev = rng.integers(
                    -9, 10, (BATCH, geo.height, geo.width, geo.event_channels)
                ).astype(np.int8)
            else:
                rgb = rng.normal(0, 1, (BATCH, geo.height, geo.width, 3)).astype(
                    np.float32
                )
                ev = rng.normal(
                    0, 1, (BATCH, geo.height, geo.width, geo.event_channels)
                ).astype(np.float32)
            out.append((rgb, ev))
        return out

    def sync(o):
        np.asarray(o[0])  # host fetch: the only real barrier on the relay

    results = {}
    for wire, iters in (("compact", ITERS_U8), ("f32", ITERS_F32)):
        infer = make_inference_fn(model, variables, cfg, wire=wire)
        batches = make_batches(wire)
        print(f"[{wire}] compiling...", file=sys.stderr, flush=True)
        sync(infer(*batches[0]))
        sync(infer(*batches[1]))
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            # fresh numpy batch every call = full wire cost, like a record run;
            # dispatch is async so upload k+1 overlaps compute k
            out = infer(*batches[i % len(batches)])
        sync(out)
        elapsed = time.perf_counter() - t0
        results[wire] = round(BATCH * iters / elapsed, 2)
        print(f"[{wire}] {results[wire]} img/s streaming", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "dsec_fusion_streaming_eval_img_s",
                "value": results["compact"],
                "unit": "img/s",
                "value_f32_wire": results["f32"],
                "speedup_vs_f32_wire": round(results["compact"] / results["f32"], 2),
                "batch": BATCH,
            }
        )
    )


if __name__ == "__main__":
    main()
