"""Numerics of the Pallas implicit-GEMM stem kernel vs the XLA conv.

Reference oracle: lax.conv_general_dilated(7x7, stride 2, torch padding 3)
+ per-channel affine + ReLU in f32 — the exact contraction the stem performs
(models/resnet.py conv1+bn1+relu; /root/reference/retinanet/model.py:171-198).
Runs the kernel in interpret mode so it tests on the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frn_tpu.ops.stem import pack_stem_weights, stem_conv_bn_relu


def _oracle(x, w, scale, bias, relu=True):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize(
    "shape,f",
    [
        ((2, 32, 48, 3), 64),   # RGB-like, OH multiple of TM
        ((1, 26, 34, 5), 32),   # voxel-like, OH=13 exercises row padding
        ((1, 64, 96, 3), 8),    # taller grid, several steps
    ],
)
def test_stem_kernel_matches_xla_conv(shape, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, shape[-1], f)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, f), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, f), jnp.float32)

    ref = np.asarray(_oracle(x, w, scale, bias))
    got = np.asarray(
        stem_conv_bn_relu(x, w, scale, bias, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_stem_kernel_bf16_close_to_f32_oracle():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 24, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 16)), jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, 16), jnp.float32)
    ref = np.asarray(_oracle(x, w, scale, bias))
    got = np.asarray(
        stem_conv_bn_relu(x, w, scale, bias, interpret=True)
    ).astype(np.float32)
    # bf16 inputs, f32 accumulation: tolerance is the bf16 input rounding
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_pack_stem_weights_layout():
    """Slot (kh, kw*C+c) -> row kh*8C + kw*C+c; remainder rows zero."""
    c, f = 3, 4
    w = jnp.asarray(
        np.arange(7 * 7 * c * f, dtype=np.float32).reshape(7, 7, c, f)
    )
    packed = np.asarray(pack_stem_weights(w))
    assert packed.shape == (176, f)
    for kh in (0, 3, 6):
        for kw in (0, 2, 6):
            for cc in range(c):
                row = kh * 8 * c + kw * c + cc
                np.testing.assert_array_equal(
                    packed[row], np.asarray(w[kh, kw, cc])
                )
    # q=3 remainder slots (o in [7C, 8C)) and sublane padding rows are zero
    for kh in range(7):
        assert np.all(packed[kh * 24 + 21:kh * 24 + 24] == 0)
    assert np.all(packed[168:] == 0)
