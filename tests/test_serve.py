"""Serving engine + HTTP front end.

The reference's serving-equivalent path is the offline detect_image loop
(visulize_fusion.py:47-131): batch-1 forward, host filter score>0.5. The
engine must (a) return exactly what a direct batch-1 forward returns no matter
which padded bucket a request rides in, (b) accept the reference's raw serving
inputs (npz voxels / raw event streams, visulize_fusion.py:65-72), and (c)
expose it all over stdlib HTTP.
"""

import dataclasses
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from frn_tpu.config import DSEC, FrameworkConfig, ModelConfig
from frn_tpu.models.detector import (
    decode_detections,
    eval_output_for,
    image_anchors,
    init_detector,
)
from frn_tpu.serve import DetectionServer, ServeOptions, ServingEngine

# Scores from random init sit near the 0.01 focal prior, so serving thresholds
# must sit below that for detections to exist at all.
SERVE_THR = 0.005


def _small_cfg(h=64, w=96):
    cfg = FrameworkConfig(
        geometry=dataclasses.replace(DSEC, height=h, width=w),
        model=ModelConfig(
            variant="fusion", depth=18, num_classes=3, feature_size=32,
            attention_chunk=128,
        ),
    )
    return dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, score_threshold=0.0)
    )


@pytest.fixture(scope="module")
def served_model():
    cfg = _small_cfg()
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


@pytest.fixture(scope="module")
def engine(served_model):
    cfg, model, variables = served_model
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(1, 2, 4), max_delay_ms=150.0,
                     score_threshold=SERVE_THR, wire_format="f32"),
    )
    eng.start()
    yield eng
    eng.stop()


@pytest.fixture(scope="module")
def engine_compact(served_model):
    cfg, model, variables = served_model
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(1,), max_delay_ms=0.0,
                     score_threshold=SERVE_THR, wire_format="compact"),
    )
    eng.start()
    yield eng
    eng.stop()


def _rand_inputs(cfg, seed):
    rng = np.random.default_rng(seed)
    geo = cfg.geometry
    rgb = rng.normal(0, 1, (geo.height, geo.width, 3)).astype(np.float32)
    event = rng.normal(0, 1, (geo.height, geo.width, geo.event_channels)).astype(
        np.float32
    )
    return rgb, event


def _direct_reference(served_model, rgb, event, thr=SERVE_THR):
    """Batch-1 direct forward + decode + host threshold — what the engine must
    reproduce for every request regardless of batching/padding."""
    cfg, model, variables = served_model
    cls, reg = model.apply(
        variables, rgb[None], event[None], train=False,
        eval_output=eval_output_for(cfg),
    )
    s, l, b = decode_detections(cls, reg, cfg, anchors=image_anchors(cfg))
    s, l, b = np.asarray(s)[0], np.asarray(l)[0], np.asarray(b)[0]
    keep = s > thr
    return s[keep], l[keep], b[keep]


def test_options_validation(served_model):
    cfg, model, variables = served_model
    with pytest.raises(ValueError):
        ServingEngine(model, variables, cfg, ServeOptions(buckets=(4, 2, 1)))
    with pytest.raises(ValueError):
        ServingEngine(model, variables, cfg, ServeOptions(buckets=()))


def test_shape_validation(engine, served_model):
    cfg = served_model[0]
    rgb, event = _rand_inputs(cfg, 0)
    with pytest.raises(ValueError):
        engine.submit(rgb[:-2], event)
    with pytest.raises(ValueError):
        engine.submit(rgb, event[..., :-1])


def test_single_request_matches_direct_forward(engine, served_model):
    cfg = served_model[0]
    rgb, event = _rand_inputs(cfg, 1)
    det = engine.infer(rgb, event, timeout=300)
    s, l, b = _direct_reference(served_model, rgb, event)
    assert det.scores.shape[0] == s.shape[0] > 0
    np.testing.assert_allclose(det.scores, s, atol=1e-6)
    np.testing.assert_array_equal(det.labels, l)
    np.testing.assert_allclose(det.boxes, b, atol=1e-4)
    assert det.latency_ms > 0


def test_padded_bucket_is_invariant(served_model):
    """A lone request forced into a batch-4 bucket (3 zero-padded slots) must
    return the same detections as the direct batch-1 forward."""
    cfg, model, variables = served_model
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(4,), max_delay_ms=0.0, score_threshold=SERVE_THR,
                     wire_format="f32"),
    )
    with eng:
        rgb, event = _rand_inputs(cfg, 2)
        det = eng.infer(rgb, event, timeout=300)
    assert det.batch_size == 4
    s, l, b = _direct_reference(served_model, rgb, event)
    np.testing.assert_allclose(det.scores, s, atol=1e-6)
    np.testing.assert_array_equal(det.labels, l)
    np.testing.assert_allclose(det.boxes, b, atol=1e-4)
    stats = eng.stats()
    assert stats["requests"] == 1 and stats["batches"] == 1
    assert stats["mean_batch_fill"] == pytest.approx(0.25)


def test_concurrent_submissions_coalesce_and_match(engine, served_model):
    cfg = served_model[0]
    inputs = [_rand_inputs(cfg, 10 + i) for i in range(3)]
    futs = [engine.submit(rgb, event) for rgb, event in inputs]
    dets = [f.result(timeout=300) for f in futs]
    for (rgb, event), det in zip(inputs, dets):
        s, l, b = _direct_reference(served_model, rgb, event)
        np.testing.assert_allclose(det.scores, s, atol=1e-6)
        np.testing.assert_array_equal(det.labels, l)
        np.testing.assert_allclose(det.boxes, b, atol=1e-4)
        assert det.batch_size in (1, 2, 4)
    stats = engine.stats()
    assert stats["requests"] >= 3
    assert stats["latency_ms_p50"] > 0


def test_submit_events_equals_host_preprocessed(engine, served_model):
    """Raw event stream + [0,1] RGB through submit_events must equal manual
    voxelize+normalize fed to submit (the full serving path is exactly the
    dataset preprocessing, dsec_data.py:347-387,:461-462)."""
    from frn_tpu.data.transforms import normalize_rgb
    from frn_tpu.ops.voxelize import normalize_event_voxel_np, voxelize_events_np

    cfg = served_model[0]
    geo = cfg.geometry
    rng = np.random.default_rng(3)
    n = 2000
    x = rng.integers(0, geo.width, n).astype(np.int64)
    y = rng.integers(0, geo.height, n).astype(np.int64)
    t = np.sort(rng.integers(0, 50_000, n)).astype(np.int64)
    p = rng.integers(0, 2, n).astype(np.int64)
    rgb01 = rng.uniform(0, 1, (geo.height, geo.width, 3)).astype(np.float32)

    det_raw = engine.submit_events(x, y, t, p, rgb01).result(timeout=300)

    voxel = normalize_event_voxel_np(
        voxelize_events_np(x, y, t, p, num_bins=geo.event_channels,
                           height=geo.height, width=geo.width)
    )
    det_pre = engine.infer(
        normalize_rgb(rgb01, geo), np.transpose(voxel, (1, 2, 0)), timeout=300
    )
    np.testing.assert_allclose(det_raw.scores, det_pre.scores, atol=1e-6)
    np.testing.assert_array_equal(det_raw.labels, det_pre.labels)
    np.testing.assert_allclose(det_raw.boxes, det_pre.boxes, atol=1e-5)


def test_engine_requires_start(served_model):
    cfg, model, variables = served_model
    eng = ServingEngine(model, variables, cfg)
    rgb, event = _rand_inputs(cfg, 4)
    with pytest.raises(RuntimeError):
        eng.submit(rgb, event)


# -- compact wire format ------------------------------------------------------


def _raw_inputs(cfg, seed):
    """uint8 camera frame + integer polarity-count voxel (the raw client data)."""
    rng = np.random.default_rng(seed)
    geo = cfg.geometry
    rgb_u8 = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)
    counts = rng.poisson(1.5, (geo.height, geo.width, geo.event_channels))
    counts = (counts * np.where(rng.random(counts.shape) < 0.5, -1, 1)).astype(
        np.float32
    )
    counts[0, 0, 0] = 9.0  # force past the tanh threshold (max |v| > 5)
    return rgb_u8, counts


def test_compact_wire_matches_host_normalization(engine_compact, served_model):
    """uint8+int8 over the wire with on-device normalization must reproduce
    the host pipeline (u8/255 -> standardize; tanh(counts/5) iff max>5)."""
    from frn_tpu.data.transforms import normalize_rgb
    from frn_tpu.ops.voxelize import normalize_event_voxel_np

    cfg = served_model[0]
    rgb_u8, counts = _raw_inputs(cfg, 20)
    det = engine_compact.infer(rgb_u8, counts, timeout=300)

    rgb_f = normalize_rgb(rgb_u8.astype(np.float32) / 255.0, cfg.geometry)
    event_f = normalize_event_voxel_np(counts)
    s, l, b = _direct_reference(served_model, rgb_f, event_f)
    assert det.scores.shape[0] == s.shape[0] > 0
    np.testing.assert_allclose(det.scores, s, atol=2e-5)
    np.testing.assert_array_equal(det.labels, l)
    np.testing.assert_allclose(det.boxes, b, atol=1e-3)


def test_compact_submit_events_roundtrip(engine_compact, served_model):
    """Raw event stream through the compact engine == voxelizing on the host
    and submitting the counts."""
    from frn_tpu.ops.voxelize import voxelize_events_np

    cfg = served_model[0]
    geo = cfg.geometry
    rng = np.random.default_rng(21)
    n = 3000
    x = rng.integers(0, geo.width, n).astype(np.int64)
    y = rng.integers(0, geo.height, n).astype(np.int64)
    t = np.sort(rng.integers(0, 50_000, n)).astype(np.int64)
    p = rng.integers(0, 2, n).astype(np.int64)
    rgb01 = rng.uniform(0, 1, (geo.height, geo.width, 3)).astype(np.float32)
    rgb01 = np.rint(rgb01 * 255.0) / 255.0  # u8-sourced floats (lossless wire)

    det_raw = engine_compact.submit_events(x, y, t, p, rgb01).result(timeout=300)
    voxel = np.transpose(
        voxelize_events_np(x, y, t, p, num_bins=geo.event_channels,
                           height=geo.height, width=geo.width),
        (1, 2, 0),
    )
    det_counts = engine_compact.infer(rgb01, voxel, timeout=300)
    np.testing.assert_allclose(det_raw.scores, det_counts.scores, atol=1e-6)
    np.testing.assert_array_equal(det_raw.labels, det_counts.labels)
    np.testing.assert_allclose(det_raw.boxes, det_counts.boxes, atol=1e-5)


def test_compact_rejects_unscaled_floats(engine_compact, served_model):
    cfg = served_model[0]
    rgb, event = _rand_inputs(cfg, 22)  # normalized f32 tensors (max >> 1)
    with pytest.raises(ValueError):
        engine_compact.submit(rgb, event)


def test_compact_rejects_gray_geometry(served_model):
    cfg, model, variables = served_model
    gray_cfg = dataclasses.replace(
        cfg, geometry=dataclasses.replace(cfg.geometry, event_channels=1)
    )
    with pytest.raises(ValueError):
        ServingEngine(model, variables, gray_cfg,
                      ServeOptions(wire_format="compact"))


def test_prepare_inputs_compact_passthrough(engine_compact, served_model):
    from frn_tpu.serve.http import _prepare_inputs

    cfg = served_model[0]
    rgb_u8, counts = _raw_inputs(cfg, 23)
    rgb, event = _prepare_inputs(engine_compact, dict(rgb=rgb_u8, event=counts))
    assert rgb.dtype == np.uint8  # no host normalization in compact mode
    np.testing.assert_array_equal(event, counts)
    with pytest.raises(ValueError):
        _prepare_inputs(
            engine_compact,
            dict(rgb=rgb_u8, event=counts, preprocessed=np.int32(1)),
        )


# -- mesh-sharded (multi-chip) serving -----------------------------------------


def test_mesh_sharded_serving_matches_single_device(served_model):
    """The PARITY.md multi-chip serving design as code: replicated weights,
    batch sharded over the 'data' axis. Per-request detections must be
    identical to the direct single-device forward."""
    from frn_tpu.parallel.mesh import make_mesh

    cfg, model, variables = served_model
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(8,), max_delay_ms=0.0, score_threshold=SERVE_THR,
                     wire_format="f32"),
        mesh=mesh,
    )
    with eng:
        for seed in (40, 41):
            rgb, event = _rand_inputs(cfg, seed)
            det = eng.infer(rgb, event, timeout=600)
            assert det.batch_size == 8  # 1 real row + 7 padded, sharded 8-way
            s, l, b = _direct_reference(served_model, rgb, event)
            np.testing.assert_allclose(det.scores, s, atol=1e-6)
            np.testing.assert_array_equal(det.labels, l)
            np.testing.assert_allclose(det.boxes, b, atol=1e-4)


def test_mesh_rejects_indivisible_buckets(served_model):
    from frn_tpu.parallel.mesh import make_mesh

    cfg, model, variables = served_model
    with pytest.raises(ValueError):
        ServingEngine(model, variables, cfg,
                      ServeOptions(buckets=(1, 2, 4), wire_format="f32"),
                      mesh=make_mesh())


# -- events wire format (device-side voxelization) -----------------------------


@pytest.fixture(scope="module")
def engine_events(served_model):
    cfg, model, variables = served_model
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(1,), max_delay_ms=0.0, score_threshold=SERVE_THR,
                     wire_format="events", event_capacity=4096),
    )
    eng.start()
    yield eng
    eng.stop()


def _raw_stream(cfg, seed, n=3000, t_base=0):
    rng = np.random.default_rng(seed)
    geo = cfg.geometry
    x = rng.integers(0, geo.width, n).astype(np.int64)
    y = rng.integers(0, geo.height, n).astype(np.int64)
    t = t_base + np.sort(rng.integers(0, 50_000, n)).astype(np.int64)
    p = rng.integers(0, 2, n).astype(np.int64)
    return x, y, t, p


def test_events_wire_matches_host_voxelizer(engine_events, served_model):
    """Raw x/y/t/p over the wire with ON-DEVICE voxelization must reproduce the
    host pipeline (host voxelize + tanh + standardized RGB -> f32 forward).
    Large t_base exercises the int32 window-relative rebase (raw i64 us
    timestamps)."""
    from frn_tpu.data.transforms import normalize_rgb
    from frn_tpu.ops.voxelize import normalize_event_voxel_np, voxelize_events_np

    cfg = served_model[0]
    geo = cfg.geometry
    x, y, t, p = _raw_stream(cfg, 30, t_base=7_000_000_000)  # > int32 max
    rng = np.random.default_rng(31)
    rgb_u8 = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)

    det = engine_events.submit_events(x, y, t, p, rgb_u8).result(timeout=300)

    voxel = voxelize_events_np(
        x, y, t, p, num_bins=geo.event_channels, height=geo.height,
        width=geo.width,
    )
    event_f = normalize_event_voxel_np(np.transpose(voxel, (1, 2, 0)))
    rgb_f = normalize_rgb(rgb_u8.astype(np.float32) / 255.0, geo)
    s, l, b = _direct_reference(served_model, rgb_f, event_f)
    assert det.scores.shape[0] == s.shape[0] > 0
    np.testing.assert_allclose(det.scores, s, atol=2e-5)
    np.testing.assert_array_equal(det.labels, l)
    np.testing.assert_allclose(det.boxes, b, atol=1e-3)


def test_events_wire_truncation_counted(engine_events, served_model):
    cfg = served_model[0]
    geo = cfg.geometry
    cap = engine_events.options.event_capacity
    x, y, t, p = _raw_stream(cfg, 32, n=cap + 500)
    rgb = np.zeros((geo.height, geo.width, 3), np.uint8)
    before = engine_events.stats().get("truncated_events", 0)
    det = engine_events.submit_events(x, y, t, p, rgb).result(timeout=300)
    assert isinstance(det.scores, np.ndarray)
    assert engine_events.stats()["truncated_events"] == before + 500


def test_events_wire_rejects_plain_submit(engine_events, served_model):
    cfg = served_model[0]
    geo = cfg.geometry
    rgb = np.zeros((geo.height, geo.width, 3), np.uint8)
    voxel = np.zeros((geo.height, geo.width, geo.event_channels), np.float32)
    with pytest.raises(ValueError):
        engine_events.submit(rgb, voxel)


@pytest.fixture(scope="module")
def server_events(engine_events):
    srv = DetectionServer(engine_events, host="127.0.0.1", port=0, timeout_s=300)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_http_events_server_raw_stream(server_events, served_model):
    cfg = served_model[0]
    geo = cfg.geometry
    x, y, t, p = _raw_stream(cfg, 33, n=800)
    rng = np.random.default_rng(34)
    status, body = _post(
        server_events,
        dict(rgb=rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8),
             x=x, y=y, t=t, p=p),
    )
    assert status == 200 and isinstance(body["detections"], list)


def test_http_events_server_rejects_voxel_payload(server_events, served_model):
    cfg = served_model[0]
    geo = cfg.geometry
    buf_payload = dict(
        rgb=np.zeros((geo.height, geo.width, 3), np.uint8),
        event=np.zeros((geo.event_channels, geo.height, geo.width), np.float32),
    )
    import io as _io
    import urllib.request as _rq

    buf = _io.BytesIO()
    np.savez(buf, **buf_payload)
    host, port = server_events.address
    req = _rq.Request(f"http://{host}:{port}/infer", data=buf.getvalue(),
                      method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        _rq.urlopen(req, timeout=30)
    assert exc.value.code == 400


# -- HTTP front end -----------------------------------------------------------


@pytest.fixture(scope="module")
def server(engine):
    srv = DetectionServer(engine, host="127.0.0.1", port=0, timeout_s=300)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(server, payload: dict, compressed=False):
    buf = io.BytesIO()
    (np.savez_compressed if compressed else np.savez)(buf, **payload)
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}/infer", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def test_http_healthz_and_stats(server):
    host, port = server.address
    with urllib.request.urlopen(f"http://{host}:{port}/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}
    with urllib.request.urlopen(f"http://{host}:{port}/stats", timeout=30) as r:
        assert "requests" in json.loads(r.read())


def test_http_infer_preprocessed_voxel(server, engine, served_model):
    cfg = served_model[0]
    rgb, event = _rand_inputs(cfg, 5)
    status, body = _post(
        server, dict(rgb=rgb, event=event, preprocessed=np.int32(1))
    )
    assert status == 200
    s, l, b = _direct_reference(served_model, rgb, event)
    assert len(body["detections"]) == len(s)
    got = body["detections"][0]
    assert got["class"] == cfg.geometry.class_names[int(l[0])]
    np.testing.assert_allclose(
        [d["score"] for d in body["detections"]], s, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray([d["box"] for d in body["detections"]]), b, atol=1e-3
    )
    assert body["latency_ms"] > 0


def test_http_infer_uint8_rgb_chw_event(server, served_model):
    """uint8 RGB + CHW reference-layout voxel npz (visulize_fusion.py:65-72)."""
    cfg = served_model[0]
    geo = cfg.geometry
    rng = np.random.default_rng(6)
    rgb_u8 = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)
    event_chw = rng.normal(0, 3, (geo.event_channels, geo.height, geo.width)).astype(
        np.float32
    )
    status, body = _post(server, dict(rgb=rgb_u8, event=event_chw), compressed=True)
    assert status == 200 and isinstance(body["detections"], list)


def test_http_infer_raw_events(server, served_model):
    cfg = served_model[0]
    geo = cfg.geometry
    rng = np.random.default_rng(7)
    n = 500
    status, body = _post(
        server,
        dict(
            rgb=rng.uniform(0, 1, (geo.height, geo.width, 3)).astype(np.float32),
            x=rng.integers(0, geo.width, n),
            y=rng.integers(0, geo.height, n),
            t=np.sort(rng.integers(0, 1000, n)),
            p=rng.integers(0, 2, n),
        ),
    )
    assert status == 200 and isinstance(body["detections"], list)


def test_http_bad_payload_is_400(server):
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}/infer", data=b"not an npz", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_http_missing_event_is_400(server, served_model):
    cfg = served_model[0]
    rgb, _ = _rand_inputs(cfg, 8)
    buf = io.BytesIO()
    np.savez(buf, rgb=rgb)
    host, port = server.address
    req = urllib.request.Request(
        f"http://{host}:{port}/infer", data=buf.getvalue(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_cli_build_engine_smoke():
    """cli/serve.py arg plumbing -> a constructible engine (random init)."""
    from frn_tpu.cli.serve import build_engine, get_parser

    args = get_parser().parse_args(
        ["--image_height", "64", "--image_width", "96", "--depth", "18",
         "--feature_size", "32", "--buckets", "2,1", "--score_threshold", "0.3"]
    )
    engine, config = build_engine(args)
    assert engine.options.buckets == (1, 2)  # normalized ascending
    assert config.geometry.height == 64 and config.model.depth == 18
    # device-side pool threshold must not exceed the serving cut
    assert config.eval.score_threshold <= 0.3


def test_stop_fails_pending_requests(served_model):
    cfg, model, variables = served_model
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(1,), max_delay_ms=0.0, score_threshold=SERVE_THR,
                     wire_format="f32"),
    )
    # dispatcher already dead: stop() must fail queued futures, not hang them
    t = threading.Thread(target=lambda: None)
    t.start()
    t.join()
    eng._thread = t
    rgb, event = _rand_inputs(cfg, 9)
    fut = eng.submit(rgb, event)
    eng.stop()
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)


# -- sparse wire format (delta-coded nonzero cells) -----------------------------


@pytest.fixture(scope="module")
def engine_sparse(served_model):
    cfg, model, variables = served_model
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(1, 2), max_delay_ms=0.0, score_threshold=SERVE_THR,
                     wire_format="sparse", cell_capacity=8192),
    )
    eng.start()
    yield eng
    eng.stop()


def test_sparse_wire_matches_host_pipeline(engine_sparse, served_model):
    """A raw event stream through the sparse wire (host sparse-encode ->
    device cumsum/scatter decode + tanh + RGB standardization) must equal the
    host-preprocessed f32 forward."""
    from frn_tpu.data.transforms import normalize_rgb
    from frn_tpu.ops.voxelize import normalize_event_voxel_np, voxelize_events_np

    cfg = served_model[0]
    geo = cfg.geometry
    x, y, t, p = _raw_stream(cfg, 40, n=3000)
    rng = np.random.default_rng(41)
    rgb_u8 = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)

    det = engine_sparse.submit_events(x, y, t, p, rgb_u8).result(timeout=300)

    voxel = voxelize_events_np(
        x, y, t, p, num_bins=geo.event_channels, height=geo.height,
        width=geo.width,
    )
    event_f = normalize_event_voxel_np(np.transpose(voxel, (1, 2, 0)))
    rgb_f = normalize_rgb(rgb_u8.astype(np.float32) / 255.0, geo)
    s, l, b = _direct_reference(served_model, rgb_f, event_f)
    assert det.scores.shape[0] == s.shape[0] > 0
    np.testing.assert_allclose(det.scores, s, atol=2e-5)
    np.testing.assert_array_equal(det.labels, l)
    np.testing.assert_allclose(det.boxes, b, atol=1e-3)


def test_sparse_wire_exact_beyond_int8(engine_sparse, served_model):
    """Counts past ±127 must survive the sparse wire exactly (split cells) —
    the case where the compact wire clips. Verified against the f32 direct
    forward of the UNclipped voxel."""
    cfg = served_model[0]
    geo = cfg.geometry
    rng = np.random.default_rng(42)
    voxel = np.zeros((geo.height, geo.width, geo.event_channels), np.float32)
    ii = rng.integers(0, voxel.size, 500)
    np.add.at(voxel.ravel(), ii, rng.integers(1, 5, 500))
    voxel[7, 9, 0] = 300.0  # would clip to 127 on the compact wire
    voxel[7, 9, 1] = -301.0
    rgb_u8 = rng.integers(0, 256, (geo.height, geo.width, 3), dtype=np.uint8)

    det = engine_sparse.submit(rgb_u8, voxel).result(timeout=300)

    from frn_tpu.data.transforms import normalize_rgb
    from frn_tpu.ops.voxelize import normalize_event_voxel_np

    rgb_f = normalize_rgb(rgb_u8.astype(np.float32) / 255.0, geo)
    s, l, b = _direct_reference(served_model, rgb_f,
                                normalize_event_voxel_np(voxel))
    np.testing.assert_allclose(det.scores, s, atol=2e-5)
    np.testing.assert_array_equal(det.labels, l)


def test_sparse_wire_truncation_counted(served_model):
    cfg, model, variables = served_model
    geo = cfg.geometry
    eng = ServingEngine(
        model, variables, cfg,
        ServeOptions(buckets=(1,), max_delay_ms=0.0, score_threshold=SERVE_THR,
                     wire_format="sparse", cell_capacity=64),
    )
    eng.start()
    try:
        voxel = np.ones((geo.height, geo.width, geo.event_channels), np.float32)
        rgb = np.zeros((geo.height, geo.width, 3), np.uint8)
        det = eng.submit(rgb, voxel).result(timeout=300)
        assert isinstance(det.scores, np.ndarray)
        assert eng.stats()["truncated_cells"] == voxel.size - 64
    finally:
        eng.stop()


def test_nonf32_wires_ship_uint8_rgb(served_model):
    """The batch buffers for every non-f32 wire must be uint8 RGB — an f32
    buffer would silently 4x the request's dominant wire payload (regression:
    the events wire shipped f32 RGB until round 4)."""
    cfg, model, variables = served_model
    for wire in ("compact", "events", "sparse"):
        eng = ServingEngine(
            model, variables, cfg,
            ServeOptions(buckets=(1,), wire_format=wire),
        )
        rgb_dt, _ = eng._wire_dtypes
        assert rgb_dt == np.uint8, wire
        payload = eng._empty_event_payload(1)
        if wire == "sparse":
            assert payload[0].dtype == np.uint16 and payload[1].dtype == np.int8
