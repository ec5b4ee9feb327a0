"""Quantify the procedural-corruption mAP deltas (VERDICT r4 task #4).

The reference evaluates corruption robustness from PRE-GENERATED folder trees
(test_dsec.py:119-139: args.root_img swapped to <corruptions>/<type>/
severity_<s>). Our `ops/corruption.py` re-implements the ImageNet-C recipes;
the closed-form types are golden-tested, but frost (photo assets) and
motion_blur/snow (ImageMagick) are procedural approximations whose mAP impact
was never bounded. This tool measures, on a TRAINED model over the synthetic
fixture:

  1. folder-vs-fly: the same procedural corruptions, written to a
     reference-style uint8 PNG folder tree and evaluated via the
     --corruption_root path, vs synthesized on the fly. Bounds the folder
     protocol itself (+ uint8 quantization) and proves corrupted_folder_dataset
     against a real tree.
  2. motion_blur formula-vs-procedural: our rotated-line kernel vs the
     ImageNet-C/ImageMagick recipe (one-sided Gaussian line, radius/sigma
     (10,3),(15,5),(15,8),(15,12),(20,15), angle uniform(-45,45)).
  3. frost reseed sensitivity: our crystalline-noise frost with two
     independent texture seeds — the spread any procedural frost (including
     a different asset photograph) would induce.

Usage (CPU, after training the fixture model — see run_corruption_delta.sh):
  python tools/corruption_delta.py --root /tmp/corrdelta --checkpoint <ckpt> \
      --severities 1,3,5
Prints one JSON line with per-cell mAPs and the three delta bounds.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2

from frn_tpu.ops import corruption as C


# ---------------------------------------------------------------- variants


def motion_blur_imagenetc(img, severity):
    """The public ImageNet-C motion blur recipe (imagecorruptions package):
    wand/ImageMagick MotionBlur — a ONE-SIDED Gaussian-weighted line kernel of
    the given radius/sigma, rotated by a random angle in (-45, 45)."""
    radius, sigma = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][severity - 1]
    rng = C._rng(img, severity)
    angle = rng.uniform(-45, 45)
    width = 2 * radius + 1
    w = np.exp(-np.arange(width) ** 2 / (2.0 * sigma ** 2)).astype(np.float32)
    w /= w.sum()
    size = width
    k = np.zeros((size, size), np.float32)
    k[size // 2, : size] = w  # one-sided: weight peaks at the leading edge
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1.0)
    k = cv2.warpAffine(k, m, (size, size))
    k /= max(k.sum(), 1e-8)
    return np.clip(cv2.filter2D(img, -1, k), 0, 1).astype(np.float32)


def frost_reseeded(img, severity):
    """ops/corruption.frost with an independent texture seed (same mixing
    weights/statistics) — measures how much ANY alternative frost texture of
    the same family moves detection mAP."""
    mix_img, mix_frost = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7),
                          (0.6, 0.75)][severity - 1]
    base = C._rng(img, severity)
    rng = np.random.default_rng(int(base.integers(0, 2 ** 31)) ^ 0x5EED)
    h, w = img.shape[:2]
    noise = np.zeros((h, w), np.float32)
    for octave in (4, 8, 16):
        small = rng.random((h // octave + 1, w // octave + 1)).astype(np.float32)
        noise += cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC) / (16 / octave)
    noise = (noise - noise.min()) / max(float(np.ptp(noise)), 1e-8)
    crystals = (noise > 0.6).astype(np.float32) * noise
    crystals = cv2.GaussianBlur(crystals, (0, 0), 1.0)
    frost_layer = np.stack([crystals * 0.95, crystals, crystals * 1.05], axis=-1)
    return np.clip(mix_img * img + mix_frost * frost_layer, 0, 1).astype(np.float32)


VARIANT_FNS = {
    "motion_blur_formula": motion_blur_imagenetc,
    "frost_reseed": frost_reseeded,
}


# ------------------------------------------------------------- folder trees


def generate_tree(dataset, out_root, corruption, severities, fn=None):
    """Write <out_root>/<corruption>/severity_<s>/<relpath>.png for every
    dataset image, replicating the image tree under the dataset's img_dir
    (the reference's pre-generated corruption layout, test_dsec.py:133)."""
    fn = fn or (lambda img, s: C.corrupt(img, corruption, s))
    for severity in severities:
        folder = os.path.join(out_root, corruption, f"severity_{severity}")
        for idx in range(len(dataset)):
            src = dataset.rgb_path(idx)
            rel = os.path.relpath(src, dataset.img_dir)
            dst = os.path.join(folder, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            img = dataset.load_rgb(idx)  # float32 [0,1], BGR like cv2.imread
            out = fn(img, severity)
            cv2.imwrite(dst, np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8))


# -------------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="fixture root (labels_test.csv etc.)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--severities", default="1,3,5")
    ap.add_argument("--image_height", type=int, default=96)
    ap.add_argument("--image_width", type=int, default=128)
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()
    severities = tuple(int(s) for s in args.severities.split(","))

    # CPU is the intended host (relay-outage workload); force it before jax init
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from types import SimpleNamespace

    from frn_tpu.cli.common import (
        build_config,
        build_csv_dataset,
        load_checkpoint_into_state,
    )
    from frn_tpu.eval import corruption_sweep, make_inference_fn
    from frn_tpu.train.loop import create_train_state

    cli = SimpleNamespace(
        dataset_name="dsec", csv_test=os.path.join(args.root, "labels_test.csv"),
        csv_train=None, csv_classes=os.path.join(args.root, "labels_map.csv"),
        root_img=os.path.join(args.root, "images"),
        root_event=os.path.join(args.root, "events"),
        fusion="fpn_fusion", depth=args.depth, compute_dtype="float32",
        image_height=args.image_height, image_width=args.image_width,
        event_type="voxel", path_schema="event_keyed",
        checkpoint=args.checkpoint, feature_size=256, attention_quant=None,
    )
    dataset = build_csv_dataset(cli, cli.csv_test)
    config = build_config(cli, dataset.num_classes(), args.batch_size)
    model, state, _ = create_train_state(
        config, jax.random.PRNGKey(0), batch_size=args.batch_size
    )
    state, _ = load_checkpoint_into_state(cli, config, state)
    infer_fn = make_inference_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats}, config
    )

    trees = os.path.join(args.root, "corruption_trees")
    # leg 2/3 variant trees carry the PRODUCTION corruption names so the
    # --corruption_root protocol reads them like any reference folder tree
    proc_root = os.path.join(trees, "procedural")
    alt_root = os.path.join(trees, "alt")
    print("generating folder trees...", file=sys.stderr, flush=True)
    for corr in ("motion_blur", "frost", "gaussian_noise"):
        generate_tree(dataset, proc_root, corr, severities)
    generate_tree(dataset, alt_root, "motion_blur", severities,
                  fn=motion_blur_imagenetc)
    generate_tree(dataset, alt_root, "frost", severities, fn=frost_reseeded)

    corrs = ["motion_blur", "frost", "gaussian_noise"]

    def sweep(corruption_root, corruptions):
        res = corruption_sweep(
            dataset, infer_fn, config, corruptions=corruptions,
            severities=severities, batch_size=args.batch_size,
            corruption_root=corruption_root,
        )
        return {
            c: {s: float(np.mean(res[c][s])) for s in severities}
            for c in corruptions
        }

    print("leg 1/3: on-the-fly...", file=sys.stderr, flush=True)
    fly = sweep(None, corrs)
    print("leg 2/3: procedural folder tree (--corruption_root)...",
          file=sys.stderr, flush=True)
    folder = sweep(proc_root, corrs)
    print("leg 3/3: formula/reseed variant tree...", file=sys.stderr, flush=True)
    alt = sweep(alt_root, ["motion_blur", "frost"])

    def max_delta(a, b, corruptions):
        return max(
            abs(a[c][s] - b[c][s]) for c in corruptions for s in severities
        )

    out = {
        "metric": "corruption_procedural_map_delta",
        "severities": list(severities),
        "mAP_fly": fly,
        "mAP_folder": folder,
        "mAP_alt": alt,
        "delta_folder_vs_fly_max": round(max_delta(fly, folder, corrs), 4),
        "delta_motionblur_formula_max": round(
            max_delta(folder, alt, ["motion_blur"]), 4),
        "delta_frost_reseed_max": round(max_delta(folder, alt, ["frost"]), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
