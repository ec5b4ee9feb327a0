"""Implicit-GEMM Pallas kernel for the ResNet stem conv (7x7, stride 2).

The stem is the one conv XLA lowers poorly on TPU: with 3-5 input channels the
NHWC channel-minor layout uses C/128 lanes, and every XLA-level rewrite tried
(channel padding, conv_general_dilated_patches, strided-slice im2col,
space-to-depth — tools/probe_stem.py) measured WORSE than the plain lowering
(1.56 ms/op @ b8 vs a ~0.12 ms bandwidth roofline on v5e).

This kernel restructures the computation around the flattened padded row: the
7-tap x C-channel window of output column ow at row tap kh is the CONTIGUOUS
flattened span  xpad_flat[2*oh + kh, 2C*ow + kw*C + c  for kw in 0..6, c in 0..C).
Deinterleaving each padded row into 2C phase planes (one XLA reshape+transpose
over the ~2 MB input) turns every patch element (kw, c) into a LANE-ALIGNED
window of phase plane r = (kw*C + c) % 2C at lane offset q = (kw*C + c) // 2C
in {0,1,2,3}. The kernel assembles the transposed patch matrix
P^T[(kh, q, r), ow] with 28 wide VPU copies per output row (each copying all
2C phases of one (kh, q) group at once) and contracts it against the
correspondingly packed weight matrix on the MXU — K = 56C (168 for RGB, 280
for 5-bin voxels) against the full 8-sublane x 128-lane tiles, instead of the
C-channel-minor geometry XLA is stuck with. The frozen-BN affine + ReLU
epilogue is fused; output is written NHWC directly.

Reference counterpart: the stem at /root/reference/retinanet/model.py:171-198
(nn.Conv2d(C, 64, kernel_size=7, stride=2, padding=3, bias=False) + BN + ReLU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 8  # output rows per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_stem_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, F) conv kernel -> (KP, F) GEMM weights in kernel slot order.

    Slot (kh, o) with o = kw*C + c lives at row kh*8C + o; rows with
    o in [7C, 8C) (the q=3 group's phase remainder that no tap maps to) and
    rows beyond 56C (sublane padding) are zero, so the patch scratch may hold
    arbitrary real data there.
    """
    kh, kw, c, f = w.shape
    assert kh == 7 and kw == 7, "stem kernel is specialized to 7x7"
    flat = w.reshape(7, 7 * c, f)
    flat = jnp.pad(flat, ((0, 0), (0, c), (0, 0)))  # offsets 7C..8C-1 -> zero
    packed = flat.reshape(7 * 8 * c, f)
    kp = _round_up(7 * 8 * c, 16)
    return jnp.pad(packed, ((0, kp - packed.shape[0]), (0, 0)))


def _deinterleave_rows(x: jnp.ndarray, hp: int, jp: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, HP, 2C, JP) phase planes of the padded flat rows."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, hp - h - 3), (3, 3), (0, 0)))
    j0 = (w + 6) // 2
    flat = xp.reshape(b, hp, (w + 6) * c)
    ph = flat.reshape(b, hp, j0, 2 * c).transpose(0, 1, 3, 2)
    return jnp.pad(ph, ((0, 0), (0, 0), (0, 0), (0, jp - j0)))


def _stem_kernel(a0, a1, a2, wm, scale, bias, out_ref, pt, *, c: int, ow: int,
                 kp: int, relu: bool):
    """One grid step: TM output rows of one image.

    a0/a1/a2: three consecutive 8-row blocks of phase planes (1, 8, 2C, JP)
    covering input rows [16t, 16t+24) — output row i of this step (static)
    reads rows 2i+kh, kh in 0..6, all static indices into the three views.
    """
    views = (a0, a1, a2)
    n_used = 7 * 8 * c

    # K rows beyond the mapped slots contract against zero weights but must not
    # hold NaN/Inf bit patterns (0 * Inf = NaN); the mapped rows are fully
    # rewritten below.
    pt[n_used:kp, :] = jnp.zeros((kp - n_used, pt.shape[1]), pt.dtype)

    for i in range(TM):
        for khi in range(7):
            row = 2 * i + khi
            plane = views[row // 8][0, row % 8]  # (2C, JP)
            base = khi * 8 * c
            for q in range(4):
                pt[base + q * 2 * c:base + (q + 1) * 2 * c, 0:ow] = (
                    plane[:, q:q + ow]
                )
        y = jax.lax.dot_general(
            pt[:], wm[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (JP, F): sublanes ow.. are garbage, sliced on write
        y = y * scale[:] + bias[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, i] = y[0:ow].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "interpret", "out_dtype")
)
def stem_conv_bn_relu(
    x: jnp.ndarray,        # (B, H, W, C) even H/W, any float dtype
    w: jnp.ndarray,        # (7, 7, C, F)
    scale: jnp.ndarray,    # (F,) fused affine scale (BN: gamma*rsqrt(var+eps))
    bias: jnp.ndarray,     # (F,) fused affine bias  (BN: beta - mean*scale)
    relu: bool = True,
    interpret: bool = False,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Fused stride-2 7x7 conv (torch padding 3) + per-channel affine + ReLU.

    Matches  relu(conv7x7_s2(x, w) * scale + bias)  with f32 accumulation and
    a single rounding to out_dtype (default x.dtype) at the end.
    """
    b, h, wd, c = x.shape
    f = w.shape[-1]
    assert h % 2 == 0 and wd % 2 == 0, "stem kernel requires even H and W"
    oh, ow = h // 2, wd // 2
    ohp = _round_up(oh, TM)
    steps = ohp // TM
    hp = 16 * steps + 8
    j0 = wd // 2 + 3
    jp = _round_up(j0, 128)
    kp = _round_up(7 * 8 * c, 16)
    out_dtype = out_dtype or x.dtype

    ph = _deinterleave_rows(x, hp, jp)
    wm = pack_stem_weights(w).astype(ph.dtype)
    scale2 = scale.reshape(1, f).astype(jnp.float32)
    bias2 = bias.reshape(1, f).astype(jnp.float32)

    view = lambda off: pl.BlockSpec(  # noqa: E731
        (1, 8, 2 * c, jp), lambda bi, t, o=off: (bi, 2 * t + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, t: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_stem_kernel, c=c, ow=ow, kp=kp, relu=relu),
        grid=(b, steps),
        in_specs=[
            view(0), view(1), view(2),
            full(kp, f), full(1, f), full(1, f),
        ],
        out_specs=pl.BlockSpec(
            (1, TM, ow, f), lambda bi, t: (bi, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ohp, ow, f), out_dtype),
        scratch_shapes=[pltpu.VMEM((kp, jp), ph.dtype)],
        interpret=interpret,
    )(ph, ph, ph, wm, scale2, bias2)
    return out[:, :oh]


def stem_kernel_available() -> bool:
    """Pallas TPU lowering requires an actual TPU backend."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
