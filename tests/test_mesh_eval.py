"""Mesh-sharded (data-parallel) evaluation: numerics identical 1-dev vs 8-dev,
plus a full train+eval integration of the fusion model at a real (non-square,
/32-divisible) geometry on the 8-virtual-device CPU mesh.

Replaces the reference's DataParallel eval wrap (test_dsec.py:103-105) with
NamedSharding over the 'data' axis.
"""

import dataclasses

import jax
import numpy as np

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig, TrainConfig
from frn_tpu.eval.detections import make_inference_fn
from frn_tpu.models.detector import init_detector
from frn_tpu.parallel.mesh import make_mesh


def _small_cfg(h=64, w=96):
    return FrameworkConfig(
        geometry=dataclasses.replace(DSEC, height=h, width=w),
        model=ModelConfig(
            variant="fusion", depth=18, num_classes=3, feature_size=32,
            attention_chunk=128,
        ),
        train=TrainConfig(batch_size=8, max_annots_per_image=4),
    )


def test_mesh_inference_matches_single_device():
    assert len(jax.devices()) == 8, "virtual CPU mesh expected (see conftest)"
    cfg = _small_cfg()
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    # spread head outputs so detections exist (init cls prior is ~0.01 < 0.05)
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    rng = np.random.default_rng(0)
    geo = cfg.geometry
    rgb = rng.normal(0, 1, (8, geo.height, geo.width, 3)).astype(np.float32)
    event = rng.normal(0, 1, (8, geo.height, geo.width, 5)).astype(np.float32)

    infer_1 = make_inference_fn(model, variables, cfg)
    infer_8 = make_inference_fn(model, variables, cfg, mesh=make_mesh())

    s1, l1, b1 = jax.tree_util.tree_map(np.asarray, infer_1(rgb, event))
    s8, l8, b8 = jax.tree_util.tree_map(np.asarray, infer_8(rgb, event))
    np.testing.assert_array_equal(l1, l8)
    np.testing.assert_allclose(s1, s8, atol=1e-6)
    np.testing.assert_allclose(b1, b8, atol=1e-4)


def test_fusion_train_and_eval_on_mesh_full_geometry(tmp_path):
    """Train 2 DP steps AND run sharded eval of the fusion variant end-to-end at
    96x128 (non-square geometry exercises anchors/FPN/NMS beyond the 32x32
    dryrun)."""
    from frn_tpu.data.csv_dataset import CSVDetectionDataset
    from frn_tpu.data.synthetic import make_csv_fixture
    from frn_tpu.eval.evaluator import evaluate_dataset
    from frn_tpu.parallel.mesh import replicate, shard_batch
    from frn_tpu.train.loop import create_train_state, make_train_step

    cfg = _small_cfg(96, 128)
    mesh = make_mesh()
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, tx, cfg, donate=False)
    state = replicate(state, mesh)

    rng = np.random.default_rng(1)
    h, w = cfg.geometry.height, cfg.geometry.width
    annots = np.full((8, 4, 5), -1.0, np.float32)
    annots[:, 0] = [8, 8, 40, 40, 1]
    annots[:, 1] = [50, 30, 90, 70, 0]
    for _ in range(2):
        batch = shard_batch(
            {
                "event": rng.normal(0, 1, (8, h, w, 5)).astype(np.float32),
                "rgb": rng.normal(0, 1, (8, h, w, 3)).astype(np.float32),
                "annot": annots,
            },
            mesh,
        )
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    fix = make_csv_fixture(str(tmp_path), geometry=cfg.geometry, num_images=8, seed=0)
    dataset = CSVDetectionDataset(
        cfg.geometry, fix["annotations_csv"], fix["class_map_csv"],
        fix["event_dir"], fix["img_dir"],
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    infer = make_inference_fn(model, variables, cfg, mesh=mesh)
    res = evaluate_dataset(dataset, infer, cfg, batch_size=8)
    assert set(res.per_class_aps.keys()) == {0, 1, 2}
    assert all(np.isfinite(v) for v in res.summary.values())
