"""Serving-engine benchmark on the real chip: sustained rps + latency tails.

Drives frn_tpu/serve/ServingEngine closed-loop at DSEC geometry (480x640,
depth-50 fusion, bf16) and reports sustained throughput, latency percentiles,
and batch fill. This measures what bench.py cannot: the full request->response
path including host-side batching, the per-batch host fetch, and the
dispatch/fetch pipeline overlap (ServeOptions.pipeline_depth).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serve.py

Env knobs:
  FRN_SERVE_BUCKETS=16        comma ladder; default single bucket 16 to keep
                              first-run compiles bounded (one executable/bucket)
  FRN_SERVE_REQUESTS=512      total requests per measured config
  FRN_SERVE_OUTSTANDING=64    closed-loop window (offered concurrency)
  FRN_SERVE_DELAY_MS=2        coalescing delay
  FRN_SERVE_PIPELINE=2        pipeline depths to A/B (comma list; depth-1 vs 2
                              measured 0.68 vs 1.68 rps at f32 — overlap matters)
  FRN_SERVE_WIRE=compact,f32  wire formats to A/B: pre-normalized f32, uint8+int8
                              device-normalized ('compact'), raw x/y/t/p streams
                              voxelized on device ('events'), delta-coded
                              nonzero voxel cells decoded on device ('sparse')
  FRN_SERVE_EVENTS_N=30000    events per request for the 'events'/'sparse' wires
  FRN_SERVE_CAPACITY=65536    static event slots for the 'events' wire
  FRN_SERVE_CELLS=24576       static cell slots for the 'sparse' wire
  FRN_SERVE_REALISTIC=0       1 = spatially clustered event streams (real event
                              cameras fire on edges/objects; uniform-random
                              streams are the sparse wire's worst case)
  FRN_SERVE_DEPTH=50          backbone depth

Context (measured 2026-08-18): the axon relay moves incompressible request
data at ~45 MB/s, so serving here is wire-bound, not compute-bound — f32
requests are 9.8 MB/img (~4.6 img/s ceiling), compact 2.5 MB/img. A real TPU
host ingests over PCIe at GB/s; the compact format is still the right design
there (4x less bandwidth + no host-side f32 normalization).
"""

import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

BUCKETS = tuple(
    int(b) for b in os.environ.get("FRN_SERVE_BUCKETS", "16").split(",")
)
REQUESTS = int(os.environ.get("FRN_SERVE_REQUESTS", "512"))
OUTSTANDING = int(os.environ.get("FRN_SERVE_OUTSTANDING", "64"))
DELAY_MS = float(os.environ.get("FRN_SERVE_DELAY_MS", "2"))
PIPELINE = tuple(
    int(p) for p in os.environ.get("FRN_SERVE_PIPELINE", "2").split(",")
)
WIRE = tuple(os.environ.get("FRN_SERVE_WIRE", "compact,f32").split(","))
EVENTS_N = int(os.environ.get("FRN_SERVE_EVENTS_N", "30000"))
CAPACITY = int(os.environ.get("FRN_SERVE_CAPACITY", "65536"))
CELLS = int(os.environ.get("FRN_SERVE_CELLS", "24576"))
REALISTIC = os.environ.get("FRN_SERVE_REALISTIC", "0") == "1"
DEPTH = int(os.environ.get("FRN_SERVE_DEPTH", "50"))


def main():
    from frn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.models.detector import init_detector
    from frn_tpu.serve import ServeOptions, ServingEngine

    cfg = FrameworkConfig(
        geometry=DSEC,
        model=ModelConfig(
            variant="fusion", depth=DEPTH, num_classes=3, compute_dtype="bfloat16"
        ),
    )
    # keep cfg EXACTLY bench.py's so the batch-16 executable hits the same
    # persistent-cache entry (random-init scores then sit below the 0.05 pool
    # threshold — empty detections, but the device program is identical)
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), batch_size=1)
    geo = cfg.geometry
    rng = np.random.default_rng(0)

    def stream():
        """One event window. REALISTIC clusters events around ~40 hot spots
        (edges/objects — how event cameras actually fire); default is uniform
        random, the worst case for the sparse wire."""
        if not REALISTIC:
            return (
                rng.integers(0, geo.width, EVENTS_N),
                rng.integers(0, geo.height, EVENTS_N),
                np.sort(rng.integers(0, 50_000, EVENTS_N)),
                rng.integers(0, 2, EVENTS_N),
            )
        k = 40
        cx = rng.integers(0, geo.width, k)
        cy = rng.integers(0, geo.height, k)
        ci = rng.integers(0, k, EVENTS_N)
        x = np.clip(np.rint(cx[ci] + rng.normal(0, 6, EVENTS_N)), 0,
                    geo.width - 1).astype(np.int64)
        y = np.clip(np.rint(cy[ci] + rng.normal(0, 6, EVENTS_N)), 0,
                    geo.height - 1).astype(np.int64)
        t = np.sort(rng.integers(0, 50_000, EVENTS_N))
        p = rng.integers(0, 2, EVENTS_N)
        return x, y, t, p

    def make_inputs(wire):
        """A small rotation of distinct, INCOMPRESSIBLE inputs (the relay
        compresses zeros; random data measures the real wire)."""
        out = []
        for _ in range(4):
            if wire in ("events", "sparse"):
                rgb = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)
                ev = stream()
            elif wire == "compact":
                rgb = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)
                ev = rng.integers(
                    -9, 10, (geo.height, geo.width, geo.event_channels)
                ).astype(np.float32)
            else:
                rgb = rng.normal(0, 1, (geo.height, geo.width, 3)).astype(np.float32)
                ev = rng.normal(0, 1, (geo.height, geo.width, geo.event_channels)).astype(
                    np.float32
                )
            out.append((rgb, ev))
        return out

    results = {}
    for wire in WIRE:
        for depth in PIPELINE:
            key = f"{wire}/depth{depth}"
            opts = ServeOptions(
                buckets=BUCKETS,
                max_delay_ms=DELAY_MS,
                score_threshold=0.006,
                max_queue=max(2 * OUTSTANDING, 8),
                pipeline_depth=depth,
                wire_format=wire,
                event_capacity=CAPACITY,
                cell_capacity=CELLS,
            )
            inputs = make_inputs(wire)
            engine = ServingEngine(model, variables, cfg, opts)
            with engine:
                print(f"[{key}] warmup (compiles {BUCKETS})...",
                      file=sys.stderr, flush=True)
                engine.warmup()

                # closed loop: keep OUTSTANDING requests in flight to REQUESTS
                pending = deque()
                t0 = time.perf_counter()
                submitted = completed = 0
                while completed < REQUESTS:
                    while submitted < REQUESTS and len(pending) < OUTSTANDING:
                        rgb, event = inputs[submitted % len(inputs)]
                        if wire in ("events", "sparse"):
                            x, y, t, p = event
                            pending.append(engine.submit_events(x, y, t, p, rgb))
                        else:
                            pending.append(engine.submit(rgb, event))
                        submitted += 1
                    pending.popleft().result(timeout=600)
                    completed += 1
                elapsed = time.perf_counter() - t0
                stats = engine.stats()
            results[key] = {
                "rps": round(REQUESTS / elapsed, 2),
                "realistic_stream": REALISTIC,
                "latency_ms_p50": round(stats.get("latency_ms_p50", 0.0), 1),
                "latency_ms_p99": round(stats.get("latency_ms_p99", 0.0), 1),
                "mean_batch_fill": round(stats["mean_batch_fill"], 3),
                "batches": stats["batches"],
            }
            print(f"[{key}] {results[key]}", file=sys.stderr, flush=True)

    best = max(results, key=lambda k: results[k]["rps"])
    print(
        json.dumps(
            {
                "metric": "dsec_fusion_serving_rps",
                "value": results[best]["rps"],
                "unit": "req/s",
                "best_config": best,
                "buckets": list(BUCKETS),
                "outstanding": OUTSTANDING,
                "per_config": results,
            }
        )
    )


if __name__ == "__main__":
    main()
