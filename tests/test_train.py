"""Training-layer tests: plateau schedule, optimizer plumbing, loss decreases,
checkpoint roundtrip, multi-device data parallelism on the virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig, TrainConfig
from frn_tpu.data.collate import collate_fixed
from frn_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from frn_tpu.train import (
    ReduceLROnPlateau,
    Trainer,
    create_train_state,
    make_train_step,
    set_learning_rate,
)

TINY = dataclasses.replace(DSEC, height=32, width=32)


def tiny_config(batch_size=2, accum=1, variant="event"):
    return FrameworkConfig(
        geometry=TINY,
        model=ModelConfig(
            variant=variant, depth=18, num_classes=3, feature_size=16,
            attention_chunk=64,
        ),
        train=TrainConfig(
            batch_size=batch_size, learning_rate=1e-3, accum_steps=accum,
            max_annots_per_image=4,
        ),
    )


def synthetic_batch(rng, cfg, batch_size):
    geo = cfg.geometry
    h, w = geo.height, geo.width
    events = np.zeros((batch_size, h, w, 5), np.float32)
    rgbs = rng.normal(0, 0.1, (batch_size, h, w, 3)).astype(np.float32)
    annots = np.full((batch_size, 4, 5), -1.0, np.float32)
    for b in range(batch_size):
        x1, y1 = rng.integers(0, w // 4, 2)
        bw, bh = rng.integers(14, 24, 2)  # big enough to own positive anchors
        x2, y2 = min(x1 + bw, w - 1), min(y1 + bh, h - 1)
        annots[b, 0] = [x1, y1, x2, y2, rng.integers(0, 3)]
        events[b, y1:y2, x1:x2, :] = 1.0
        rgbs[b, y1:y2, x1:x2, :] += 1.0
    return {"event": jnp.asarray(events), "rgb": jnp.asarray(rgbs), "annot": jnp.asarray(annots)}


# ------------------------------------------------------------ plateau


def test_plateau_matches_torch_semantics():
    s = ReduceLROnPlateau(base_lr=1.0, factor=0.1, patience=3)
    lrs = [s.step(1.0)]  # first metric: improvement over inf
    for _ in range(3):
        lrs.append(s.step(1.0))  # 3 bad epochs: tolerated
    assert lrs == [1.0] * 4
    assert s.step(1.0) == pytest.approx(0.1)  # 4th bad epoch triggers
    assert s.step(0.5) == pytest.approx(0.1)  # improvement resets
    assert s.best == 0.5


def test_plateau_threshold_relative():
    s = ReduceLROnPlateau(base_lr=1.0, patience=0)
    s.step(1.0)
    # 0.99995 is NOT an improvement under threshold 1e-4 -> immediate reduce
    assert s.step(0.999999) == pytest.approx(0.1)


# ------------------------------------------------------------ optimizer


def test_set_learning_rate_reaches_injected_hyperparams():
    cfg = tiny_config(accum=2)
    _, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    new = set_learning_rate(state.opt_state, 3.14e-5)

    found = []

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in getattr(s, "hyperparams", {}):
            found.append(float(s.hyperparams["learning_rate"]))
        elif isinstance(s, (tuple, list)):
            for x in s:
                visit(x)
        elif dataclasses.is_dataclass(s):
            for f in dataclasses.fields(s):
                visit(getattr(s, f.name))

    visit(new)
    assert found and all(abs(v - 3.14e-5) < 1e-9 for v in found)  # f32 storage


def test_accumulation_applies_every_k():
    cfg = tiny_config(accum=2)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, cfg, 2)

    def max_change(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    state1, _ = step(state, batch, jax.random.PRNGKey(1))
    # after 1 micro-batch with accum=2, params unchanged
    assert max_change(state.params, state1.params) == 0.0
    state2, _ = step(state1, batch, jax.random.PRNGKey(2))
    assert max_change(state.params, state2.params) > 0.0


def test_safe_step_skips_nan_batch():
    cfg = tiny_config()
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, cfg, 2)
    bad = dict(batch)
    bad["event"] = batch["event"].at[0, 0, 0, 0].set(jnp.nan)
    state1, metrics = step(state, bad, jax.random.PRNGKey(1))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------ learning


def test_loss_decreases_on_fixed_batch():
    cfg = tiny_config()
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, cfg, donate=False)
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, cfg, 2)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


# ------------------------------------------------------------ checkpoint


def test_checkpoint_roundtrip(tmp_path):
    from frn_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config()
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, cfg, donate=False)
    batch = synthetic_batch(np.random.default_rng(0), cfg, 2)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(epoch=1, state=jax.device_get(state), meta={"loss_history": [2.0], "best_map": 0.1})

    _, template, _ = create_train_state(cfg, jax.random.PRNGKey(9))
    restored, meta = mgr.restore(template)
    assert meta["epoch"] == 1 and meta["best_map"] == 0.1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    mgr.close()


# ------------------------------------------------------------ data parallel


def test_dp_train_step_matches_single_device():
    assert len(jax.devices()) == 8, "virtual CPU mesh expected (see conftest)"
    cfg = tiny_config(batch_size=8)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, cfg, donate=False)
    batch = synthetic_batch(np.random.default_rng(1), cfg, 8)

    # single device
    s1, m1 = step(state, batch, jax.random.PRNGKey(5))

    # 8-way data parallel: replicated params, batch sharded over 'data'
    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    s8, m8 = step(state_r, batch_s, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_loss_threshold_guard_optional():
    import dataclasses as dc

    cfg = tiny_config()
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, loss_skip_threshold=1e-9))
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    from frn_tpu.train import make_train_step as mts

    step = mts(model, tx, cfg, donate=False)
    batch = synthetic_batch(np.random.default_rng(0), cfg, 2)
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    # any finite loss exceeds 1e-9 -> skipped, params unchanged
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warmup_scales_first_updates():
    import dataclasses as dc

    cfg = tiny_config()
    cfg_w = dc.replace(cfg, train=dc.replace(cfg.train, warmup_steps=100))
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, cfg, 2)

    def first_update_norm(c):
        model, state, tx = create_train_state(c, jax.random.PRNGKey(0))
        step = make_train_step(model, tx, c, donate=False)
        s1, _ = step(state, batch, jax.random.PRNGKey(1))
        return sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(s1.params),
            )
        )

    base = first_update_norm(cfg)
    warm = first_update_norm(cfg_w)
    assert warm < base * 0.05  # first warmup step is ~1/100 of the full step


def test_reference_accumulation_matches_torch_microloop():
    """EXACT (drift-free) parity of the accumulation+clip+Adam semantics vs a
    literal torch micro-loop. The whole-model trajectory test
    (test_whole_model_parity.py) proves end-to-end wiring but compounds f32
    drift through 50+ layers; here the gradients are fixed vectors, so any
    divergence is semantic: Adam eps placement/bias correction, torch's 1e-6
    clip denominator, the clip-of-running-SUM ordering (clip(clip(g1)+g2), not
    clip(mean)), or the step boundary."""
    torch = pytest.importorskip("torch")
    import optax

    from frn_tpu.train.loop import reference_grad_accumulation

    rng = np.random.default_rng(42)
    n = 37
    w0 = rng.normal(0, 1, n).astype(np.float32)
    # gradient norms straddle the 0.1 clip threshold so both clip branches run
    grads = [
        (rng.normal(0, 1, n) * scale).astype(np.float32)
        for scale in (1.0, 0.5, 0.004, 2.0, 0.003, 0.002, 1.5, 0.8, 3.0, 0.001)
    ]

    # --- torch: backward-accumulated grads, clip_grad_norm_ each micro-batch,
    # step every 2 (train_dsec.py:155-163)
    w_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([w_t], lr=1e-4)
    num_batches = 0
    for g in grads:
        loss = (w_t * torch.from_numpy(g)).sum()  # d loss / d w == g
        loss.backward()
        torch.nn.utils.clip_grad_norm_([w_t], 0.1)
        num_batches += 1
        if num_batches == 2:
            opt.step()
            opt.zero_grad()
            num_batches = 0

    # --- ours
    inner = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    tx = reference_grad_accumulation(inner, every_k=2, clip_norm=0.1)
    w_j = jnp.asarray(w0)
    state = tx.init(w_j)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, w_j)
        w_j = optax.apply_updates(w_j, updates)

    np.testing.assert_allclose(
        np.asarray(w_j), w_t.detach().numpy(), rtol=0, atol=2e-7
    )


def test_reference_accumulation_diverges_from_multisteps_semantics():
    """Teeth check: optax.MultiSteps(chain(clip, adam)) — clip(mean(g)) at the
    boundary — produces a measurably different trajectory whenever a
    micro-gradient norm exceeds the clip threshold, which is why
    make_optimizer does NOT use it (train/loop.py)."""
    import optax

    from frn_tpu.train.loop import reference_grad_accumulation

    rng = np.random.default_rng(7)
    n = 16
    w0 = rng.normal(0, 1, n).astype(np.float32)
    grads = [rng.normal(0, 1, n).astype(np.float32) for _ in range(4)]

    inner = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    tx_ref = reference_grad_accumulation(inner, every_k=2, clip_norm=0.1)
    tx_ms = optax.MultiSteps(
        optax.chain(
            optax.clip_by_global_norm(0.1),
            optax.inject_hyperparams(optax.adam)(learning_rate=1e-4),
        ),
        every_k_schedule=2,
    )

    def run(tx):
        w = jnp.asarray(w0)
        s = tx.init(w)
        for g in grads:
            u, s = tx.update(jnp.asarray(g), s, w)
            w = optax.apply_updates(w, u)
        return np.asarray(w)

    diff = np.abs(run(tx_ref) - run(tx_ms)).max()
    assert diff > 1e-6, f"expected semantic divergence, got {diff}"
