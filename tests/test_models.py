"""Model-layer tests: torch numeric parity for primitives, shape tests for variants."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frn_tpu.config import DDD17, DSEC, FrameworkConfig, ModelConfig
from frn_tpu.models import (
    FRNDetector,
    decode_detections,
    detection_loss,
    image_anchors,
    init_detector,
)
from frn_tpu.models.fusion import adain
from frn_tpu.models.layers import Conv, FrozenBatchNorm
from frn_tpu.ops.attention import nonlocal_attention
from frn_tpu.ops.upsample import bilinear_resize, nearest_upsample_2x

RNG = np.random.default_rng(42)

# tiny geometries for fast CPU tests; ddd17-like is deliberately non-divisible
TINY_DSEC = dataclasses.replace(DSEC, height=64, width=96)
TINY_DDD17 = dataclasses.replace(DDD17, height=52, width=70)


# ------------------------------------------------------------ torch parity


def test_conv_frozen_bn_matches_torch():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(2, 9, 13, 4)).astype(np.float32)  # NHWC

    conv = Conv(features=6, kernel_size=3, stride=2, padding=1, use_bias=False)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))

    w = params["params"]["Conv_0"]["kernel"]  # (kh, kw, in, out)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(np.transpose(np.asarray(w), (3, 2, 0, 1))))

    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    want = tconv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)

    # frozen BN vs torch eval-mode BN with random running stats
    bn = FrozenBatchNorm()
    variables = bn.init(jax.random.PRNGKey(1), jnp.asarray(got))
    gamma = RNG.normal(size=6).astype(np.float32)
    beta = RNG.normal(size=6).astype(np.float32)
    mean = RNG.normal(size=6).astype(np.float32)
    var = RNG.uniform(0.5, 2.0, 6).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    got_bn = np.asarray(bn.apply(variables, jnp.asarray(got)))

    tbn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(gamma))
        tbn.bias.copy_(torch.tensor(beta))
        tbn.running_mean.copy_(torch.tensor(mean))
        tbn.running_var.copy_(torch.tensor(var))
    want_bn = tbn(torch.tensor(np.transpose(got, (0, 3, 1, 2)))).detach().numpy()
    np.testing.assert_allclose(
        got_bn, np.transpose(want_bn, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
    )


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    from frn_tpu.models.layers import max_pool_3x3_s2

    x = RNG.normal(size=(1, 15, 17, 3)).astype(np.float32)
    got = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
    want = (
        torch.nn.MaxPool2d(3, stride=2, padding=1)(
            torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        )
        .numpy()
    )
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-6)


def test_adain_matches_torch_semantics():
    # replicate AdaIN.py with torch var(dim=2) (unbiased) on numpy
    content = RNG.normal(size=(2, 6, 7, 5)).astype(np.float32)
    style = RNG.normal(size=(2, 6, 7, 5)).astype(np.float32) * 2 + 1

    def np_mean_std(feat_nhwc):
        b, h, w, c = feat_nhwc.shape
        flat = feat_nhwc.reshape(b, h * w, c)
        mean = flat.mean(axis=1)
        var = flat.var(axis=1, ddof=1) + 1e-5
        return mean, np.sqrt(var)

    sm, ss = np_mean_std(style)
    cm, cs = np_mean_std(content)
    want = (content - cm[:, None, None, :]) / cs[:, None, None, :] * ss[
        :, None, None, :
    ] + sm[:, None, None, :]

    got = np.asarray(adain(jnp.asarray(content), jnp.asarray(style)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bilinear_resize_matches_torch():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(2, 9, 11, 4)).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), (17, 22)))
    want = (
        torch.nn.functional.interpolate(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))),
            size=(17, 22),
            mode="bilinear",
            align_corners=False,
        )
        .numpy()
    )
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)


def test_nearest_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    x = RNG.normal(size=(1, 5, 6, 3)).astype(np.float32)
    got = np.asarray(nearest_upsample_2x(jnp.asarray(x)))
    want = (
        torch.nn.Upsample(scale_factor=2, mode="nearest")(
            torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        )
        .numpy()
    )
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-6)


# ------------------------------------------------------------ attention


def test_chunked_attention_matches_dense():
    b, hw, c8 = 2, 50, 8
    g = jnp.asarray(RNG.normal(size=(b, hw, c8)).astype(np.float32))
    theta = jnp.asarray(RNG.normal(size=(b, hw, c8)).astype(np.float32))
    phi = jnp.asarray(RNG.normal(size=(b, hw, c8)).astype(np.float32))
    dense = nonlocal_attention(g, theta, phi, chunk=hw)
    chunked = nonlocal_attention(g, theta, phi, chunk=16)  # 50 -> 4 blocks with pad
    np.testing.assert_allclose(np.asarray(dense), np.asarray(chunked), rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_nonlocal():
    torch = pytest.importorskip("torch")
    b, hw, c8 = 1, 30, 4
    g = RNG.normal(size=(b, hw, c8)).astype(np.float32)
    theta = RNG.normal(size=(b, hw, c8)).astype(np.float32)
    phi = RNG.normal(size=(b, hw, c8)).astype(np.float32)

    got = np.asarray(nonlocal_attention(jnp.asarray(g), jnp.asarray(theta), jnp.asarray(phi)))
    # torch: f = matmul(phi (B,HW,C8), theta^T (B,C8,HW)); softmax; y = f @ g
    tf = torch.softmax(
        torch.tensor(phi) @ torch.tensor(theta).transpose(1, 2), dim=-1
    )
    want = (tf @ torch.tensor(g)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ detector variants


@pytest.mark.parametrize("variant", ["rgb", "event", "fusion"])
@pytest.mark.parametrize("geo", [TINY_DSEC, TINY_DDD17], ids=["dsec", "ddd17"])
def test_detector_forward_shapes(variant, geo):
    cfg = FrameworkConfig(
        geometry=geo,
        model=ModelConfig(
            variant=variant, depth=18, num_classes=geo.num_classes, feature_size=32,
            attention_chunk=64,
        ),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    rgb = jnp.asarray(RNG.normal(size=(1, geo.height, geo.width, 3)).astype(np.float32))
    event = jnp.asarray(
        RNG.normal(size=(1, geo.height, geo.width, geo.event_channels)).astype(np.float32)
    )
    cls, reg = model.apply(variables, rgb, event, train=False)
    a = image_anchors(cfg).shape[0]
    assert cls.shape == (1, a, geo.num_classes)
    assert reg.shape == (1, a, 4)
    assert np.isfinite(np.asarray(cls)).all() and np.isfinite(np.asarray(reg)).all()
    # prior-bias init: background prob ~0.01 everywhere at init
    assert 0.005 < float(jnp.mean(cls)) < 0.02

    # probs output pairs with the dense postprocess (the pooled default takes
    # chanlast logits via eval_output_for(cfg))
    cfg_dense = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, postprocess="dense")
    )
    s, l, b = decode_detections(cls, reg, cfg_dense)
    m = cfg.eval.max_detections
    assert s.shape == (1, m) and l.shape == (1, m) and b.shape == (1, m, 4)


def test_detector_loss_and_grads():
    cfg = FrameworkConfig(
        geometry=TINY_DSEC,
        model=ModelConfig(variant="fusion", depth=18, num_classes=3, feature_size=32,
                          attention_chunk=64),
    )
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    geo = cfg.geometry
    rgb = jnp.asarray(RNG.normal(size=(2, geo.height, geo.width, 3)).astype(np.float32))
    event = jnp.asarray(RNG.normal(size=(2, geo.height, geo.width, 5)).astype(np.float32))
    annots = np.full((2, 4, 5), -1.0, np.float32)
    annots[0, 0] = [10, 10, 40, 40, 0]
    annots[1, 0] = [20, 5, 60, 30, 2]
    annots = jnp.asarray(annots)

    params = variables["params"]
    stats = {"batch_stats": variables.get("batch_stats", {})}

    def loss_fn(p):
        cls, reg = model.apply(
            {"params": p, **stats}, rgb, event, train=True,
            rngs={"modality": jax.random.PRNGKey(7)},
        )
        lc, lr = detection_loss(cls, reg, annots, cfg)
        return lc + lr

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least some gradient signal reaches both backbones
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert max(norms) > 0


def test_packed_heads_match_per_level():
    """Canvas-packed head evaluation must reproduce the per-level path exactly
    (separator + mask construction, see models/heads.py docstring)."""
    from frn_tpu.models.heads import ClassificationHead, RegressionHead, apply_heads

    rng = np.random.default_rng(0)
    # DSEC-like pyramid at 1/4 scale, 5 levels, non-divisible small shapes
    shapes = [(30, 40), (15, 20), (8, 10), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.normal(0, 1, (2, h, w, 32)), jnp.float32)
             for h, w in shapes]
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=32,
                                  prior=0.01)
    reg_head = RegressionHead(num_anchors=9, feature_size=32)
    cv = cls_head.init(jax.random.PRNGKey(0), feats[0])
    rv = reg_head.init(jax.random.PRNGKey(1), feats[0])

    def run(packed):
        return apply_heads(
            lambda f, **kw: cls_head.apply(cv, f, **kw),
            lambda f, **kw: reg_head.apply(rv, f, **kw),
            feats, packed=packed,
        )

    cls_p, reg_p = run(True)
    cls_u, reg_u = run(False)
    assert cls_p.shape == cls_u.shape and reg_p.shape == reg_u.shape
    np.testing.assert_allclose(np.asarray(reg_p), np.asarray(reg_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls_p), np.asarray(cls_u), atol=1e-6)


def test_space_to_depth_stem_matches_plain_conv():
    """The s2d stem rewrite must reproduce nn.Conv's 7x7/s2 output exactly
    (same params, same contraction; only the lowering differs)."""
    rng = np.random.default_rng(3)
    for h, w, cin in ((48, 64, 3), (33, 47, 5)):
        x = jnp.asarray(rng.normal(0, 1, (2, h, w, cin)), jnp.float32)
        plain = Conv(16, 7, 2, 3, use_bias=False)
        s2d = Conv(16, 7, 2, 3, use_bias=False, space_to_depth=True)
        v = plain.init(jax.random.PRNGKey(0), x)
        v2 = s2d.init(jax.random.PRNGKey(0), x)
        # identical param paths and shapes
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
        y_plain = plain.apply(v, x)
        y_s2d = s2d.apply(v, x)
        assert y_plain.shape == y_s2d.shape
        np.testing.assert_allclose(
            np.asarray(y_s2d), np.asarray(y_plain), atol=2e-5, rtol=1e-5
        )


def test_fused_dual_heads_match_module_path():
    """The grouped-conv fused dual-head path must reproduce the separate
    cls/reg module outputs (same per-group contractions; only the lowering
    differs) AND propagate gradients to the same head params."""
    from frn_tpu.models.heads import (
        ClassificationHead, RegressionHead, apply_heads, fused_dual_heads,
    )

    rng = np.random.default_rng(4)
    shapes = [(30, 40), (15, 20), (8, 10)]
    feats = [jnp.asarray(rng.normal(0, 1, (2, h, w, 32)), jnp.float32)
             for h, w in shapes]
    cls_head = ClassificationHead(num_classes=3, num_anchors=9, feature_size=32,
                                  prior=0.01)
    reg_head = RegressionHead(num_anchors=9, feature_size=32)
    # non-trivial weights (zero-init output convs would hide output-layer bugs)
    cv = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype),
        cls_head.init(jax.random.PRNGKey(0), feats[0]))
    rv = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype),
        reg_head.init(jax.random.PRNGKey(1), feats[0]))

    cls_m, reg_m = apply_heads(
        lambda f, **kw: cls_head.apply(cv, f, **kw),
        lambda f, **kw: reg_head.apply(rv, f, **kw), feats)
    cls_f, reg_f = fused_dual_heads(
        cv["params"], rv["params"], feats, num_classes=3, num_anchors=9)
    # grouped-conv accumulation order differs from the separate convs at the
    # last f32 ulp (measured max |d| 1.3e-6 on 0.01% of elements)
    np.testing.assert_allclose(np.asarray(cls_f), np.asarray(cls_m), atol=5e-6)
    np.testing.assert_allclose(np.asarray(reg_f), np.asarray(reg_m), atol=1e-5)

    def loss_fused(params):
        c, r = fused_dual_heads(params[0], params[1], feats, 3, 9)
        return jnp.sum(c) + jnp.sum(jnp.abs(r))

    def loss_module(params):
        c, r = apply_heads(
            lambda f, **kw: cls_head.apply({"params": params[0]}, f, **kw),
            lambda f, **kw: reg_head.apply({"params": params[1]}, f, **kw), feats)
        return jnp.sum(c) + jnp.sum(jnp.abs(r))

    gf = jax.grad(loss_fused)((cv["params"], rv["params"]))
    gm = jax.grad(loss_module)((cv["params"], rv["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)


def test_detector_fused_heads_flag_consistency():
    """Detector forward with fused_heads on vs off must agree (the fused path
    reads the SAME params via self.variables)."""
    cfg_on = FrameworkConfig(
        geometry=dataclasses.replace(DSEC, height=64, width=64),
        model=ModelConfig(variant="rgb", depth=18, num_classes=3,
                          feature_size=32, fused_heads=True),
    )
    cfg_off = dataclasses.replace(
        cfg_on, model=dataclasses.replace(cfg_on.model, fused_heads=False))
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    event = jnp.zeros((2, 64, 64, 5), jnp.float32)

    m_on, v = init_detector(cfg_on, jax.random.PRNGKey(0), batch_size=2)
    m_off = FRNDetector(cfg_off)
    c_on, r_on = m_on.apply(v, rgb, event, train=False)
    c_off, r_off = m_off.apply(v, rgb, event, train=False)
    np.testing.assert_allclose(np.asarray(c_on), np.asarray(c_off), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off), atol=1e-5)


def test_detector_fused_attention_flag_consistency():
    """Detector forward with fused_attention on vs off must agree: the fused
    path concatenates the SAME projection weight columns (read via
    self.variables) into one C->3C/8 conv per stream and batches both
    attention directions on the kernel grid dim, so per-output dot products
    and per-batch attention rows are bit-compatible up to f32 reduction
    order."""
    cfg_on = FrameworkConfig(
        geometry=dataclasses.replace(DSEC, height=64, width=64),
        model=ModelConfig(variant="fusion", depth=18, num_classes=3,
                          feature_size=32, attention_chunk=128,
                          fused_attention=True),
    )
    cfg_off = dataclasses.replace(
        cfg_on, model=dataclasses.replace(cfg_on.model, fused_attention=False))
    rng = np.random.default_rng(11)
    rgb = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    event = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 5)), jnp.float32)

    m_on, v = init_detector(cfg_on, jax.random.PRNGKey(0), batch_size=2)
    m_off = FRNDetector(cfg_off)
    c_on, r_on = m_on.apply(v, rgb, event, train=False)
    c_off, r_off = m_off.apply(v, rgb, event, train=False)
    np.testing.assert_allclose(np.asarray(c_on), np.asarray(c_off),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off),
                               atol=2e-4, rtol=1e-4)


def test_fused_attention_gradients_match():
    """The fused dual-attention path must carry gradients to the same fusion
    params as the sequential path (it reads them via self.variables, which
    must stay differentiable through flax's scope)."""
    from frn_tpu.models.fusion import REFusion

    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)), jnp.float32)
    m_on = REFusion(channels=32, chunk=64, fused_attention=True)
    m_off = REFusion(channels=32, chunk=64, fused_attention=False)
    v = m_off.init(jax.random.PRNGKey(3), a, b)

    def loss(params, m):
        return jnp.sum(m.apply({"params": params}, a, b) ** 2)

    g_on = jax.grad(loss)(v["params"], m_on)
    g_off = jax.grad(loss)(v["params"], m_off)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    assert len(flat_on) == len(flat_off)
    for (pa, ga), (pb, gb) in zip(flat_on, flat_off):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=5e-4, rtol=1e-4)


def test_detector_flash_exp_bf16_flag_wiring():
    """flash_exp_bf16 must thread through the fusion stack and be a no-op where
    the Pallas kernel is unavailable (CPU) and on the training path (no VJP is
    defined for the bf16-exp forward). Kernel-level numerics are covered in
    test_flash_attention.py."""
    cfg_on = FrameworkConfig(
        geometry=dataclasses.replace(DSEC, height=64, width=64),
        model=ModelConfig(variant="fusion", depth=18, num_classes=3,
                          feature_size=32, attention_chunk=128,
                          flash_exp_bf16=True),
    )
    cfg_off = dataclasses.replace(
        cfg_on, model=dataclasses.replace(cfg_on.model, flash_exp_bf16=False))
    rng = np.random.default_rng(7)
    rgb = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    event = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 5)), jnp.float32)

    m_on, v = init_detector(cfg_on, jax.random.PRNGKey(0), batch_size=2)
    m_off = FRNDetector(cfg_off)
    c_on, r_on = m_on.apply(v, rgb, event, train=False)
    c_off, r_off = m_off.apply(v, rgb, event, train=False)
    np.testing.assert_array_equal(np.asarray(c_on), np.asarray(c_off))
    np.testing.assert_array_equal(np.asarray(r_on), np.asarray(r_off))

    # training path must still differentiate (flag forced off under train=True)
    stats = {"batch_stats": v.get("batch_stats", {})}

    def loss_fn(params):
        c, r = m_on.apply(
            {"params": params, **stats}, rgb, event,
            train=True, rngs={"modality": jax.random.PRNGKey(1)},
        )
        return jnp.sum(c.astype(jnp.float32) ** 2) + jnp.sum(r.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(v["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
