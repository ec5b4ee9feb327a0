"""Flash-attention kernel tests (interpret mode on CPU) vs the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frn_tpu.ops.flash_attention import _flash_forward, _reference_attention

RNG = np.random.default_rng(9)


@pytest.mark.parametrize(
    "b,n,d", [(1, 100, 32), (2, 513, 32), (1, 1100, 64)]
)
def test_flash_matches_reference_interpret(b, n, d):
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    want = np.asarray(_reference_attention(g, th, ph))
    got = np.asarray(
        _flash_forward(ph, th, g, block_q=128, block_k=256, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_exact_fit_matches_reference():
    # n a multiple of both blocks: the round-4 exact-fit path (no row padding,
    # no masking bias lanes, fused v ones-lane concat) must stay exact
    b, n, d = 2, 512, 32
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    want = np.asarray(_reference_attention(g, th, ph))
    got = np.asarray(
        _flash_forward(ph, th, g, block_q=128, block_k=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pick_fwd_blocks_exact_fit_at_production_shapes():
    from frn_tpu.ops.flash_attention import _pick_fwd_blocks

    # DSEC stage 1 (120x160) and stage 2 (60x80) must get exact-fit grids;
    # DDD17 stage 1 (65x87 = 5655, no aligned divisor) gets the minimal-pad
    # fallback (5760 = 3x1920, 1.9% pad, vs the old 6144 = 6x1024, 8.6%)
    for n in (19200, 4800):
        bq, bk, _ = _pick_fwd_blocks(n)
        assert n % bq == 0 and n % bk == 0, (n, bq, bk)
    bq, bk, mb = _pick_fwd_blocks(5655)
    assert (bq, bk) == (1920, 1920) and mb == 96
    assert -(-5655 // bq) * bq == 5760
    # DDD17 stage 2 (33x44 = 1452): single block rounds to the sublane (1456,
    # 0.3% pad) instead of the padded-1024 grid's 2048 (41%)
    bq, bk, _ = _pick_fwd_blocks(1452)
    assert (bq, bk) == (1456, 1456) and 1456 % 8 == 0
    # for_lse (train forward): exact-fit divisors keep their grids, but the
    # no-divisor fallback pins to the padded 1024/default-VMEM config — every
    # raised-VMEM minimal-pad variant crashes the v5e worker at DDD17 b16 in
    # the full train graph (2026-08-21 bisect, PARITY.md)
    for n in (19200, 4800):
        assert _pick_fwd_blocks(n, for_lse=True) == _pick_fwd_blocks(n)
    assert _pick_fwd_blocks(5655, for_lse=True) == (1024, 1024, 0)
    assert _pick_fwd_blocks(1452, for_lse=True) == (1024, 1024, 0)
    assert _pick_fwd_blocks(19201, for_lse=True) == (1024, 1024, 0)
    # custom 1024x1280 geometry: stage-1 81,920 tokens divide by 4096 exactly
    bq, bk, _ = _pick_fwd_blocks(81920)
    assert 81920 % bq == 0
    # large-N minimal-pad fallback: a prime-ish count near stage-1 scale must
    # not fall back to blind 4096 padding when a tighter candidate exists
    bq, bk, _ = _pick_fwd_blocks(19201)
    assert -(-19201 // bq) * bq <= -(-19201 // 4096) * 4096


def test_flash_padding_mask_correct():
    # n not a multiple of the blocks: padded keys must not leak into the softmax
    b, n, d = 1, 130, 32
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    want = np.asarray(_reference_attention(g, th, ph))
    got = np.asarray(_flash_forward(ph, th, g, block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_vjp_matches_reference_grads():
    b, n, d = 1, 96, 16
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)

    def loss_ref(g, th, ph):
        return jnp.sum(_reference_attention(g, th, ph) ** 2)

    # the custom_vjp backward recomputes through the reference, so compare the
    # registered bwd directly
    from frn_tpu.ops.flash_attention import _bwd_scan

    # emulate upstream cotangent of sum-of-squares (forward runs interpreted on CPU)
    out = _flash_forward(ph, th, g, block_q=128, block_k=128, interpret=True)
    ct = 2.0 * out
    got = _bwd_scan((g, th, ph), ct)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(g, th, ph)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_pallas_backward_matches_dense_vjp_interpret():
    from frn_tpu.ops.flash_attention import _flash_backward

    b, n, d = 1, 200, 32
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ct = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)

    o, lse = _flash_forward(ph, th, g, block_q=128, block_k=128,
                            interpret=True, return_lse=True)
    dq, dk, dv = _flash_backward(ph, th, g, o, lse, ct,
                                 block_q=128, block_k=128, interpret=True)

    _, vjp = jax.vjp(_reference_attention, g, th, ph)
    want_dg, want_dth, want_dph = vjp(ct)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dg), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dth), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dph), atol=2e-4, rtol=1e-3)


def test_pallas_backward_exact_fit_matches_dense_vjp_interpret():
    # n a multiple of both blocks: the bwd pads become no-ops (round-4
    # _pick_bwd_blocks prefers exact-fit 1920 blocks at stage-1 shapes)
    from frn_tpu.ops.flash_attention import _flash_backward

    b, n, d = 1, 256, 32
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ct = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)

    o, lse = _flash_forward(ph, th, g, block_q=128, block_k=128,
                            interpret=True, return_lse=True)
    dq, dk, dv = _flash_backward(ph, th, g, o, lse, ct,
                                 block_q=128, block_k=128, interpret=True)

    _, vjp = jax.vjp(_reference_attention, g, th, ph)
    want_dg, want_dth, want_dph = vjp(ct)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dg), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dth), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dph), atol=2e-4, rtol=1e-3)


def test_pick_bwd_blocks_exact_fit_at_production_shapes():
    from frn_tpu.ops.flash_attention import _pick_bwd_blocks

    bq, bk, mb = _pick_bwd_blocks(19200)  # DSEC stage 1: 10x10 grid of 1920
    assert (bq, bk) == (1920, 1920) and 19200 % bq == 0 and mb == 96
    bq, bk, mb = _pick_bwd_blocks(4800)  # DSEC stage 2: 5x5 grid of 960
    assert (bq, bk) == (960, 960) and 4800 % bq == 0
    # no-divisor counts pin to the padded 1024/default-VMEM config: the
    # minimal-pad bwd variants (1920@96, single 1456@48) crash the v5e worker
    # at DDD17 b16 in the full train graph (2026-08-21 bisect, PARITY.md)
    assert _pick_bwd_blocks(5655) == (1024, 1024, 0)
    assert _pick_bwd_blocks(1452) == (1024, 1024, 0)


def test_lse_output_matches_dense():
    b, n, d = 2, 150, 16
    g = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(RNG.normal(0, 1, (b, n, d)), jnp.float32)
    _, lse = _flash_forward(ph, th, g, block_q=128, block_k=128,
                            interpret=True, return_lse=True)
    scores = jnp.einsum("bqc,bkc->bqk", ph, th)
    want = jax.scipy.special.logsumexp(scores, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k_splits,q_splits", [(2, 1), (1, 2), (2, 2)])
def test_flash_split_variants_match(k_splits, q_splits):
    """In-body k/q sub-block unrolls are exact reformulations."""
    rng = np.random.default_rng(5)
    g, th, ph = (jnp.asarray(rng.normal(0, 1, (2, 300, 16)), jnp.float32)
                 for _ in range(3))
    base = np.asarray(_flash_forward(ph, th, g, block_q=128, block_k=128,
                                     interpret=True))
    got = np.asarray(_flash_forward(
        ph, th, g, block_q=128, block_k=128,
        k_splits=k_splits, q_splits=q_splits, interpret=True,
    ))
    np.testing.assert_allclose(got, base, atol=1e-5, rtol=1e-5)


def test_flash_dispatch_skips_head_dim_128(monkeypatch):
    """VERDICT r2 weak #5: --image_height 1024 --image_width 1280 makes stage-3
    5,120 tokens with C/8 = 128 head dim, which the Pallas kernel cannot take
    (it reserves one of the 128 lanes for the key-padding bias). The dispatcher
    must fall back to the chunked dense route BEFORE consulting the flash path;
    with the guard missing this test would crash (flash on CPU / d-lane assert
    at trace time)."""
    import frn_tpu.ops.flash_attention as fa
    from frn_tpu.ops.attention import nonlocal_attention

    def boom(*a, **k):  # the flash path must never be entered for d=128
        raise AssertionError("flash path taken for head dim 128")

    monkeypatch.setattr(fa, "flash_attention_available", lambda: True)
    monkeypatch.setattr(fa, "flash_nonlocal_attention", boom)
    monkeypatch.delenv("FRN_DISABLE_FLASH", raising=False)

    b, hw, d = 1, 5120, 128  # stage-3 at 1024x1280
    rng = np.random.default_rng(21)
    g = jnp.asarray(rng.normal(0, 1, (b, hw, d)), jnp.float32)
    th = jnp.asarray(rng.normal(0, 1, (b, hw, d)), jnp.float32)
    ph = jnp.asarray(rng.normal(0, 1, (b, hw, d)), jnp.float32)
    got = np.asarray(nonlocal_attention(g, th, ph))
    want = np.asarray(_reference_attention(g, th, ph))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_flash_exp2_matches_exp():
    """use_exp2 folds log2(e) into Q and uses the VPU-native exp2 — weights are
    2^(log2e*s) == e^s up to one extra rounding of the scaled Q; outputs must
    agree with the exp path to f32-rounding tolerance, and the emitted lse must
    stay in the natural-log domain."""
    from frn_tpu.ops.flash_attention import _flash_forward

    rng = np.random.default_rng(33)
    b, n, d = 2, 300, 32
    q = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    base, lse_base = _flash_forward(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True)
    got, lse_got = _flash_forward(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True,
        use_exp2=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lse_got), np.asarray(lse_base), atol=2e-4, rtol=2e-5)


@pytest.mark.parametrize("mode", ["int8", "int8_qk"])
def test_int8_kernel_matches_dense_sim_single_block(mode):
    """With one k block covering all keys, the kernel's running max IS the
    global max, so its quantization algebra must match the dense simulation
    (quantized_attention_reference) exactly up to f32 reassociation."""
    from frn_tpu.ops.flash_attention import (
        _flash_forward_int8,
        quantized_attention_reference,
    )

    rng = np.random.default_rng(55)
    b, n, d = 2, 200, 32
    g = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    want = np.asarray(quantized_attention_reference(g, th, ph, mode=mode))
    got = np.asarray(
        _flash_forward_int8(ph, th, g, mode=mode, block_q=128, block_k=256,
                            interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("mode", ["int8", "int8_qk"])
def test_int8_kernel_multiblock_padding_close_to_exact(mode):
    """Multi-k-block with key padding: the iota mask must kill padded keys
    (a broken mask gives padded columns score 0, often the row max — wildly
    wrong outputs), and the quantized output must track the exact f32
    attention within the dynamic-quantization error envelope."""
    from frn_tpu.ops.flash_attention import _flash_forward_int8

    rng = np.random.default_rng(56)
    b, n, d = 2, 330, 32
    g = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    th = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    ph = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    want = np.asarray(_reference_attention(g, th, ph))
    got = np.asarray(
        _flash_forward_int8(ph, th, g, mode=mode, block_q=128, block_k=128,
                            interpret=True)
    )
    # dynamic int8 quantization of N(0,1) inputs at d=32: score error std
    # ~0.13 -> per-weight relative error ~15%; the weighted mean cancels most
    # of it. These bounds are measured envelopes, not f32 tolerances.
    err = np.abs(got - want)
    assert err.max() < 0.35, err.max()
    assert err.mean() < 0.03, err.mean()


def test_int8_qk_exact_when_inputs_representable():
    """When Q and K are exactly representable on the int8 grid (values on
    max/127 steps), 'int8_qk' quantization is lossless and the kernel must
    match the exact attention to f32 tolerance."""
    from frn_tpu.ops.flash_attention import _flash_forward_int8

    rng = np.random.default_rng(57)
    b, n, d = 1, 260, 32
    scale_q, scale_k = 0.031, 0.017
    qi = rng.integers(-127, 128, (b, n, d)).astype(np.float32)
    ki = rng.integers(-127, 128, (b, n, d)).astype(np.float32)
    # force the max so the dynamic scale reproduces the grid exactly
    qi[0, 0, 0], ki[0, 0, 0] = 127.0, -127.0
    q = jnp.asarray(qi * scale_q)
    k = jnp.asarray(ki * scale_k)
    v = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    want = np.asarray(_reference_attention(v, k, q))
    got = np.asarray(
        _flash_forward_int8(q, k, v, mode="int8_qk", block_q=128, block_k=128,
                            interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_flash_exp_bf16_close_to_f32():
    """exp_bf16 computes the softmax weights from a bf16 (s - m): the dominant
    near-max weights see only bf16 roundoff (the PV matmul consumed bf16 p
    already), so outputs must track the f32-exp kernel to ~bf16 tolerance."""
    from frn_tpu.ops.flash_attention import _flash_forward

    rng = np.random.default_rng(44)
    b, n, d = 2, 300, 32
    q = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, n, d)), jnp.float32)
    base = _flash_forward(q, k, v, block_q=128, block_k=128, interpret=True)
    got = _flash_forward(q, k, v, block_q=128, block_k=128, interpret=True,
                         exp_bf16=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=2e-2, rtol=2e-2)
