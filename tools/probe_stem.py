"""Stem-conv lowering experiments: the 7x7/s2 3->64 stem measures ~2.4 ms/op
@ b8 (slope) — ~20x its bandwidth roofline (~0.12 ms: 108 MB moved @ 819 GB/s)
and ~40x its FLOP floor (11.6 GFLOP @ 197 TF/s = 0.06 ms). Candidates measured
here, all numerically equivalent contractions:

  plain      — nn.Conv as the model runs it today (baseline)
  cin8/16    — zero-pad input channels 3->8/16 (dodge the tiny-C conv path)
  patches    — lax.conv_general_dilated_patches + 1x1 matmul (explicit im2col)
  slices     — 49 strided slices concat on C + 147->64 matmul (manual im2col)
  s2d        — space-to-depth 4x4/s1 rewrite (round-2: measured WORSE, 3.43)

Slope-probed (scan over n, two n values) so the relay's ~2 ms dispatch floor
cancels. Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/probe_stem.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from frn_tpu.utils.cache import enable_compilation_cache

B = 8
H, W, CIN, COUT = 480, 640, 3, 64
FLOPS = 2 * B * (H // 2) * (W // 2) * 7 * 7 * CIN * COUT


def _sync(x):
    np.asarray(jnp.ravel(x)[:1])


def slope(name, f, n1=4, n2=16, iters=8):
    """f: (B,H,W,CIN) -> (B,H/2,W/2,COUT). Chained via a scalar carry so scan
    can't hoist the op as loop-invariant."""
    x0 = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, H, W, CIN)),
                     jnp.bfloat16)

    def run(n):
        @jax.jit
        def g(x):
            def body(c, _):
                y = f(x + c)
                return jnp.mean(y).astype(x.dtype), ()
            c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return c

        o = g(x0)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(x0)
        _sync(o)
        return (time.perf_counter() - t0) / iters

    t1, t2 = run(n1), run(n2)
    per = (t2 - t1) / (n2 - n1)
    print(f"{name:40s} {per * 1e3:8.3f} ms/op  {FLOPS / per / 1e12:6.2f} TFLOP/s",
          flush=True)
    return per


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(0, 0.05, (7, 7, CIN, COUT)), jnp.bfloat16)

    def plain(x):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def cin_pad(c):
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, c - CIN), (0, 0)))
        def f(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c - CIN)))
            return jax.lax.conv_general_dilated(
                xp, wp, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return f

    wmat = w.reshape(7 * 7 * CIN, COUT)

    def patches(x):
        b, h, ww_ = x.shape[0], x.shape[1], x.shape[2]
        p = jax.lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches emits C-major (c, kh, kw) feature order; wmat is (kh, kw, c)
        pm = p.reshape(b, h // 2, ww_ // 2, CIN, 7, 7)
        pm = pm.transpose(0, 1, 2, 4, 5, 3).reshape(b, h // 2, ww_ // 2, 7 * 7 * CIN)
        return jax.lax.dot_general(
            pm, wmat, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def slices(x):
        b, h, ww_ = x.shape[0], x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (3, 4), (3, 4), (0, 0)))
        cols = []
        for kh in range(7):
            for kw in range(7):
                cols.append(jax.lax.slice(
                    xp, (0, kh, kw, 0), (b, kh + h, kw + ww_, CIN), (1, 2, 2, 1)))
        pm = jnp.concatenate(cols, axis=-1)  # (b, h/2, w/2, 49*CIN) kh,kw,c order
        return jax.lax.dot_general(
            pm, wmat, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # numerical agreement check (tiny shape, one shot)
    x_chk = jnp.asarray(rng.normal(0, 1, (1, 64, 96, CIN)), jnp.bfloat16)
    def chk(f):
        a = np.asarray(plain(x_chk), np.float32)
        b = np.asarray(f(x_chk), np.float32)[:, :a.shape[1], :a.shape[2]]
        return float(np.max(np.abs(a - b)))

    variants = [("stem cin->8", cin_pad(8)), ("stem cin->16", cin_pad(16)),
                ("stem patches+matmul", patches), ("stem 49-slices+matmul", slices)]
    ok = []
    for name, f in variants:
        d = chk(f)
        print(f"numerics {name}: max|d|={d:.4f}", flush=True)
        if d < 0.1:
            ok.append((name, f))
        else:
            print(f"  SKIP {name}: numerics mismatch", flush=True)

    slope("stem plain 7x7/s2 3->64", plain)
    for name, f in ok:
        slope(name, f)


if __name__ == "__main__":
    main()
