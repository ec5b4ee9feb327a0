"""Input-layout probe: does accepting inputs in XLA's preferred layout kill
the 0.93 ms voxel relayout copy the round-4 device trace attributed?

The trace (tools/trace_table.py, PARITY "Device-trace attribution") itemized
0.93 ms/step of `copy` on bf16[16,480,640,5] — XLA relaying out the NHWC voxel
input because the argument's default layout differs from what the first conv
wants. jit(in_shardings=Format(Layout.AUTO)) lets XLA pick the argument
layouts instead; device_put-ing the input into that layout once (outside the
steady-state loop — real pipelines would produce it there directly) removes
the per-step copy.

Legs (full production graph, depth-50 fusion, 480x640, pooled_chanlast,
decode+NMS included — only full-graph A/Bs decide on this stack):
  default  — inputs in default layouts (the bench.py configuration)
  auto     — inputs device_put into the compiled executable's AUTO layouts

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_input_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("FRN_BENCH_BATCH", "16"))
ITERS = int(os.environ.get("FRN_BENCH_ITERS", "20"))


def main():
    from frn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from jax.experimental.layout import Format, Layout

    from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
    from frn_tpu.eval.detections import make_inference_fn
    from frn_tpu.models.detector import image_anchors, init_detector

    import dataclasses

    cfg = FrameworkConfig(
        geometry=DSEC,
        model=ModelConfig(
            variant="fusion", depth=50, num_classes=3, compute_dtype="bfloat16"
        ),
    )
    if os.environ.get("FRN_PROBE_REG36") == "1":
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, reg_flat36=True)
        )
        print("reg_flat36=True (flat36 regression emission)")
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(
        rng.normal(0, 1, (BATCH, 480, 640, 3)), jnp.float32
    )
    event = jnp.asarray(
        rng.normal(0, 1, (BATCH, 480, 640, 5)), jnp.float32
    )

    infer = make_inference_fn(model, variables, cfg)

    def sync(o):
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1])

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:28s} {dt * 1e3:8.2f} ms  {BATCH / dt:7.1f} img/s", flush=True)
        return dt

    timeit("default layouts", infer, rgb, event)

    # --- AUTO-layout leg: recompile the same program letting XLA choose the
    # argument layouts, then feed arrays already resident in those layouts.
    from frn_tpu.models.detector import decode_detections, eval_output_for

    eval_output = eval_output_for(cfg)
    anchors = jax.device_put(image_anchors(cfg))

    def _infer(variables, anchors, rgb, event):
        cls, reg = model.apply(
            variables, rgb, event, train=False, eval_output=eval_output
        )
        return decode_detections(cls, reg, cfg, anchors=anchors)

    auto = Format(Layout.AUTO)
    jitted = jax.jit(_infer, in_shardings=(auto, auto, auto, auto))
    compiled = jitted.lower(variables, anchors, rgb, event).compile()
    fmts = compiled.input_formats
    flat_in, _ = jax.tree_util.tree_flatten((variables, anchors, rgb, event))
    flat_fmt, _ = jax.tree_util.tree_flatten(
        fmts, is_leaf=lambda x: isinstance(x, Format)
    )
    # report the image-input layouts XLA chose (last two args)
    for name, f in zip(("rgb", "event"), flat_fmt[-2:]):
        print(f"AUTO layout for {name}: {f}")
    placed = [jax.device_put(a, f) for a, f in zip(flat_in, flat_fmt)]
    treedef = jax.tree_util.tree_structure((variables, anchors, rgb, event))
    pv, pa, pr, pe = jax.tree_util.tree_unflatten(treedef, placed)
    timeit("AUTO layouts", lambda: compiled(pv, pa, pr, pe))


if __name__ == "__main__":
    main()
