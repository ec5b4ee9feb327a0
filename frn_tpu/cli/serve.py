"""Serving entry point: long-lived batched HTTP detection service.

The reference has no server — its serving-equivalent path is the offline
detect_image loop (visulize_fusion.py:47-131): batch-1 forward, host filter
score>0.5. This entry point exposes that capability as a production service:
bucketed static-shape batching (one pre-compiled executable per bucket),
bounded coalescing delay, and a stdlib HTTP front end (see
frn_tpu/serve/engine.py and frn_tpu/serve/http.py).

    python -m frn_tpu.cli.serve --checkpoint run/ckpt --port 8000
    curl -s -X POST --data-binary @frame.npz localhost:8000/infer
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from frn_tpu.cli.common import add_model_args, geometry_from_args


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve the FRN-TPU detector over HTTP")
    add_model_args(p)
    p.add_argument("--dataset_name", default="dsec", choices=["dsec", "ddd17"])
    p.add_argument("--num_classes", type=int, default=None,
                   help="override the dataset geometry's class count")
    p.add_argument("--event_type", default="voxel", choices=["voxel", "gray"])
    p.add_argument("--image_height", type=int, default=None)
    p.add_argument("--image_width", type=int, default=None)
    p.add_argument("--checkpoint", default=None,
                   help=".pt (torch) or orbax dir; omit for a random-init smoke server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--buckets", default="1,2,4,8,16",
                   help="comma-separated batch-size ladder; one compiled "
                   "executable per bucket, pre-compiled at startup")
    p.add_argument("--max_delay_ms", type=float, default=2.0,
                   help="max batching-coalesce wait once >=1 request is queued "
                   "(0 = lowest latency, a few ms = higher throughput)")
    p.add_argument("--score_threshold", type=float, default=0.5,
                   help="serving score cut (reference visulize_fusion.py:105)")
    p.add_argument("--max_queue", type=int, default=256)
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="batches in flight on device while earlier results ride "
                   "the host fetch (1 = synchronous dispatch)")
    p.add_argument("--wire_format", default=None,
                   choices=["compact", "f32", "events"],
                   help="request tensor encoding: 'compact' = raw uint8 RGB + "
                   "int8 count voxel, normalized on device (4x less input "
                   "bandwidth; default for voxel events); 'f32' = pre-normalized "
                   "eval-pipeline tensors (default for --event_type gray); "
                   "'events' = raw x/y/t/p streams, voxelized ON DEVICE "
                   "(clients never build grids)")
    p.add_argument("--event_capacity", type=int, default=65536,
                   help="'events' wire format: static event slots per request "
                   "(streams beyond it are truncated; a 50 ms DSEC window is "
                   "~25-50k events)")
    p.add_argument("--request_timeout_s", type=float, default=60.0)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling every bucket at startup")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard every batch over all devices (per-chip model "
                   "replicas; buckets must be multiples of the device count)")
    return p


def build_engine(args):
    """(engine, config) from parsed args — separated from main() for tests."""
    from frn_tpu.cli.common import FUSION_TO_VARIANT, load_checkpoint_into_state
    from frn_tpu.config import FrameworkConfig, ModelConfig
    from frn_tpu.serve import ServeOptions, ServingEngine
    from frn_tpu.train.loop import create_train_state

    geo = geometry_from_args(args, args.num_classes)
    config = FrameworkConfig(
        geometry=geo,
        model=ModelConfig(
            variant=FUSION_TO_VARIANT[args.fusion],
            depth=args.depth,
            num_classes=geo.num_classes,
            compute_dtype=args.compute_dtype,
            feature_size=args.feature_size,
            attention_quant=args.attention_quant,
        ),
    )
    buckets = tuple(sorted({int(b) for b in args.buckets.split(",") if b.strip()}))
    wire = args.wire_format or ("f32" if geo.event_channels == 1 else "compact")
    options = ServeOptions(
        buckets=buckets,
        max_delay_ms=args.max_delay_ms,
        score_threshold=args.score_threshold,
        max_queue=args.max_queue,
        pipeline_depth=args.pipeline_depth,
        wire_format=wire,
        event_capacity=args.event_capacity,
    )

    model, state, _ = create_train_state(config, jax.random.PRNGKey(0), batch_size=1)
    if args.checkpoint is None:
        print("WARNING: no --checkpoint given; serving RANDOM-INIT weights")
    state, _ = load_checkpoint_into_state(args, config, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = None
    if getattr(args, "data_parallel", False) and len(jax.devices()) > 1:
        from frn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    config = dataclasses.replace(
        config, eval=dataclasses.replace(config.eval, score_threshold=min(
            config.eval.score_threshold, args.score_threshold))
    )
    return ServingEngine(model, variables, config, options, mesh=mesh), config


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)

    from frn_tpu.cli.common import setup_runtime

    setup_runtime()
    engine, config = build_engine(args)
    engine.start()
    if not args.no_warmup:
        print(f"warming up buckets {engine.options.buckets} "
              f"at {config.geometry.height}x{config.geometry.width} ...")
        engine.warmup()

    from frn_tpu.serve import DetectionServer

    server = DetectionServer(
        engine, host=args.host, port=args.port, timeout_s=args.request_timeout_s
    )
    host, port = server.address
    print(f"serving on http://{host}:{port}  (POST /infer, GET /healthz, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.stop()
        print("final stats:", engine.stats())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
