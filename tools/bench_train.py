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

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig, TrainConfig
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

    B, N, D = 8, 19200, 32
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
               for _ in range(3))
    o, lse = _flash_forward(q, k, v, return_lse=True)
    do = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    for bq, bk in ((512, 1024), (1024, 1024), (1024, 512), (512, 512)):
        timeit(f"flash bwd (bq{bq}, bk{bk})",
               lambda bq=bq, bk=bk: _flash_backward(
                   q, k, v, o, lse, do, block_q=bq, block_k=bk))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8,12,16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--kernel-sweep", action="store_true")
    ap.add_argument("--no-donate-ab", action="store_true",
                    help="skip the donate=False leg (halves compile time)")
    args = ap.parse_args()

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    if args.kernel_sweep:
        kernel_sweep(rng)

    for batch in (int(b) for b in args.batches.split(",")):
        cfg = FrameworkConfig(
            geometry=DSEC,
            model=ModelConfig(variant="fusion", depth=50, num_classes=3,
                              compute_dtype="bfloat16"),
            train=TrainConfig(batch_size=batch, max_annots_per_image=16),
        )
        model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
        geo = cfg.geometry
        annots = np.full((batch, 16, 5), -1.0, np.float32)
        annots[:, 0] = [100, 100, 260, 260, 1]
        batch_data = {
            "rgb": jnp.asarray(
                rng.normal(0, 1, (batch, geo.height, geo.width, 3)), jnp.float32),
            "event": jnp.asarray(
                rng.normal(0, 1, (batch, geo.height, geo.width, 5)), jnp.float32),
            "annot": jnp.asarray(annots),
        }
        key = jax.random.PRNGKey(1)

        if not args.no_donate_ab:
            step_nd = make_train_step(model, tx, cfg, donate=False)

            def run_nd(state=state, batch_data=batch_data, step=step_nd, key=key):
                _, metrics = step(state, batch_data, key)
                return metrics["loss"]

            timeit(f"train step fusion b{batch} donate=F", run_nd,
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
        print(f"{f'train step fusion b{batch} donate=T':46s} {dt * 1e3:8.2f} ms"
              f"  {batch / dt:7.1f} img/s", flush=True)
        del st, state, step_d, batch_data


if __name__ == "__main__":
    main()
