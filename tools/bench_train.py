"""Train-step benchmark: batch sweep + donation A/B + flash-bwd block sweep.

The inference bench (bench.py) covers the serving path; this measures the full
production train step (fwd + bwd + optimizer, bf16 activations / f32 params)
at DSEC geometry across batch sizes, A/Bs buffer donation (the production
trainer threads state through the step, so donate=True is the honest config),
and sweeps the backward kernels' block sizes at the stage-1 attention shape.

Run alone on the chip (timings starve under any concurrent host work):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train.py \
      [--batches 2,4,8,12,16] [--iters 10] [--kernel-sweep]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.config import FrameworkConfig, ModelConfig, TrainConfig, geometry_for
from frn_tpu.train.loop import create_train_state, make_train_step
from frn_tpu.utils.cache import enable_compilation_cache


def sync(o):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1])


def timeit(name, fn, *args, iters=10, imgs=None):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {imgs / dt:7.1f} img/s" if imgs else ""
    print(f"{name:46s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def kernel_sweep(rng):
    from frn_tpu.ops.flash_attention import _flash_backward, _flash_forward

    # stage-1 (120x160 = 19,200 tokens) and stage-2 (60x80 = 4,800) shapes;
    # candidates include the exact-fit divisors of each N (no row padding).
    # Measured 2026-08-19 (v5e): small exact-fit blocks lose (n19200: 1200
    # 33.63 / 960 34.49 vs 1024 padded 32.84 — too small to feed the MXU),
    # but LARGE exact-fit blocks win once the scoped-VMEM budget is raised:
    # 1920x1920 @ 96 MB = 31.61 ms vs 33.41 padded-1024 in the same run
    # (2400 @ 96 MB: 31.84). 1920 OOMs at the default 16 MB budget — the
    # first sweep's "exact-fit loses in bwd" was a VMEM-budget artifact.
    # _pick_bwd_blocks encodes the winning picks.
    for N, blocks in (
        (19200, ((1024, 1024), (1920, 1920), (2400, 2400), (512, 1024))),
        (4800, ((1024, 1024), (1200, 1200), (960, 960), (800, 800))),
    ):
        B, D = 8, 32
        q, k, v = (jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
                   for _ in range(3))
        o, lse = _flash_forward(q, k, v, return_lse=True)
        do = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
        for bq, bk in blocks:
            fit = "exact-fit" if N % bq == 0 and N % bk == 0 else "padded"
            mb = 96 if max(bq, bk) >= 1920 else 0
            try:
                timeit(f"flash bwd n{N} (bq{bq}, bk{bk}) {fit}",
                       lambda bq=bq, bk=bk, mb=mb: _flash_backward(
                           q, k, v, o, lse, do, block_q=bq, block_k=bk,
                           vmem_limit_mb=mb))
            except Exception as e:  # noqa: BLE001 - sweep must survive OOMs
                print(f"flash bwd n{N} (bq{bq}, bk{bk}) {fit}: "
                      f"FAILED {type(e).__name__}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8,12,16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--kernel-sweep", action="store_true")
    ap.add_argument("--no-donate-ab", action="store_true",
                    help="skip the donate=False leg (halves compile time)")
    ap.add_argument("--geometry", default="dsec", choices=("dsec", "ddd17"),
                    help="benchmark geometry (DSEC 480x640 / DDD17 346x260)")
    ap.add_argument("--variant", default="fusion",
                    choices=("fusion", "rgb", "event"))
    args = ap.parse_args()

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    if args.kernel_sweep:
        kernel_sweep(rng)

    geo_cfg = geometry_for(args.geometry)
    for batch in (int(b) for b in args.batches.split(",")):
        cfg = FrameworkConfig(
            geometry=geo_cfg,
            model=ModelConfig(variant=args.variant, depth=50,
                              num_classes=geo_cfg.num_classes,
                              compute_dtype="bfloat16"),
            train=TrainConfig(batch_size=batch, max_annots_per_image=16),
        )
        model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
        geo = cfg.geometry
        annots = np.full((batch, 16, 5), -1.0, np.float32)
        annots[:, 0] = [100, 100, 240, 240, min(1, geo_cfg.num_classes - 1)]
        batch_data = {
            "rgb": jnp.asarray(
                rng.normal(0, 1, (batch, geo.height, geo.width, 3)), jnp.float32),
            "event": jnp.asarray(
                rng.normal(0, 1, (batch, geo.height, geo.width, geo.event_channels)),
                jnp.float32),
            "annot": jnp.asarray(annots),
        }
        key = jax.random.PRNGKey(1)

        if not args.no_donate_ab:
            step_nd = make_train_step(model, tx, cfg, donate=False)

            def run_nd(state=state, batch_data=batch_data, step=step_nd, key=key):
                _, metrics = step(state, batch_data, key)
                return metrics["loss"]

            timeit(f"train step {args.geometry} {args.variant} b{batch} donate=F", run_nd,
                   iters=args.iters, imgs=batch)

        # donated leg: thread state through the loop exactly like the trainer
        # (train/trainer.py) — the timing includes the state round-trip the
        # production loop actually pays
        step_d = make_train_step(model, tx, cfg, donate=True)
        st = state
        st, metrics = step_d(st, batch_data, key)  # compile + warmup
        sync(metrics["loss"])
        st, metrics = step_d(st, batch_data, key)
        sync(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, metrics = step_d(st, batch_data, key)
        sync(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{f'train step {args.geometry} {args.variant} b{batch} donate=T':46s} {dt * 1e3:8.2f} ms"
              f"  {batch / dt:7.1f} img/s", flush=True)
        del st, state, step_d, batch_data


if __name__ == "__main__":
    main()
