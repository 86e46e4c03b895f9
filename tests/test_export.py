"""Serving-export tests: BN folding equivalence + artifact roundtrip.

Reference flow being replaced: checkpoint-restore predict
(``tools/benchmark.py:60-63``).
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _small_cfg():
    from range_view_3d_detection_tpu.models.detector import DetectorConfig

    return DetectorConfig(
        tasks=((0, ("PEDESTRIAN", "REGULAR_VEHICLE")),),
        in_channels=5,
        layers=(32, 16, 16, 16, 16),
        stem_type="META",
        fpn=((1, 32),),
        fpn_kernel_sizes=((1, (3, 3)),),
        classification_head_channels=32,
        regression_head_channels=32,
        num_classification_blocks=1,
        num_regression_blocks=1,
        max_boxes=8,
        dtype="float32",
    )


def _inputs(B=1, H=16, W=64, C=5, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cart = rng.normal(size=(B, H, W, 3)).astype(np.float32) * 10
    mask = rng.uniform(size=(B, H, W)) > 0.2
    return feats, cart, mask


def test_fold_batch_norms_equivalence():
    from export import fold_batch_norms

    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    feats, cart, mask = _inputs()
    variables = model.init(
        jax.random.PRNGKey(0), feats, cart, mask, train=False
    )
    # Give the running stats non-trivial values (fresh init is 0/1).
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            x + 0.3 if any("mean" in str(p) for p in path) else x
        ),
        variables,
    )
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            x * 1.7 if any("var" in str(p) for p in path) else x
        ),
        variables,
    )
    out_ref = model.apply(variables, feats, cart, mask, train=False)

    folded = fold_batch_norms(jax.device_get(variables))
    out_folded = model.apply(folded, feats, cart, mask, train=False)

    for stride in out_ref["head"]:
        for t in out_ref["head"][stride]:
            np.testing.assert_allclose(
                np.asarray(out_ref["head"][stride][t]["logits"]),
                np.asarray(out_folded["head"][stride][t]["logits"]),
                atol=2e-4,
                rtol=2e-4,
            )


def test_artifact_roundtrip(tmp_path):
    from export import export_artifact, load_artifact

    from range_view_3d_detection_tpu.models.decoder import (
        DecoderConfig,
        decode,
    )
    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    feats, cart, mask = _inputs()
    variables = model.init(
        jax.random.PRNGKey(1), feats, cart, mask, train=False
    )
    dec_cfg = DecoderConfig(nms_cap=64, num_post_nms=16)

    export_artifact(variables, cfg, dec_cfg, tmp_path / "art")
    predict, det_cfg2, dec_cfg2 = load_artifact(tmp_path / "art")
    assert det_cfg2 == cfg
    assert dec_cfg2 == dec_cfg

    got = predict(feats, cart, mask)
    want = decode(
        model.apply(variables, feats, cart, mask, train=False),
        dec_cfg,
        cfg.tasks_dict,
        use_nms=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.cuboids), np.asarray(want.cuboids), atol=1e-4
    )


def test_latency_bench_smoke(tmp_path, monkeypatch):
    """latency_bench runs the per-request sync loop and reports ordered
    percentiles on a tiny artifact (CPU path)."""
    from export import export_artifact, latency_bench, load_artifact

    from range_view_3d_detection_tpu.models.decoder import DecoderConfig
    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    feats, cart, mask = _inputs()
    variables = model.init(
        jax.random.PRNGKey(1), feats, cart, mask, train=False
    )
    export_artifact(
        variables,
        cfg,
        DecoderConfig(nms_cap=64, num_post_nms=16),
        tmp_path / "art",
    )
    predict, det_cfg, _ = load_artifact(tmp_path / "art")

    import __graft_entry__ as ge

    def _tiny_inputs(B, H, W, C, seed=0):
        return _inputs(B, H, W, C, seed=seed)

    monkeypatch.setattr(ge, "_sample_inputs", _tiny_inputs)
    stats = latency_bench(
        predict, batch=1, iters=6, H=16, W=64, C=det_cfg.in_channels
    )
    assert stats["latency_ms_min"] > 0
    assert (
        stats["latency_ms_p50"]
        <= stats["latency_ms_p90"]
        <= stats["latency_ms_p99"]
    )


def test_chunked_predict_matches_per_call(tmp_path):
    """The device-resident lax.scan serving loop (one dispatch per chunk,
    one micro-batch of activations live) returns exactly the per-call
    predict outputs, stacked along the chunk axis."""
    from export import export_artifact, load_artifact, make_chunked_predict

    from range_view_3d_detection_tpu.models.decoder import DecoderConfig
    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    f0, c0, m0 = _inputs(seed=0)
    variables = model.init(jax.random.PRNGKey(3), f0, c0, m0, train=False)
    art = tmp_path / "art"
    export_artifact(
        variables, cfg, DecoderConfig(nms_cap=64, num_post_nms=16), art
    )
    predict, _, _ = load_artifact(art)
    run_chunk = make_chunked_predict(predict)

    parts = [_inputs(seed=s) for s in range(3)]
    stacked = tuple(
        np.stack([np.asarray(p[j]) for p in parts]) for j in range(3)
    )
    got = run_chunk(*stacked)
    for i, (f, c, m) in enumerate(parts):
        want = predict(f, c, m)
        np.testing.assert_allclose(
            np.asarray(got.scores)[i], np.asarray(want.scores), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.cuboids)[i], np.asarray(want.cuboids), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(got.keep)[i], np.asarray(want.keep)
        )


def test_aot_export_roundtrip(tmp_path):
    """jax.export serialization: the AOT artifact runs without model code
    paths and matches the jitted predict."""
    from export import export_aot, export_artifact, load_artifact

    from range_view_3d_detection_tpu.models.decoder import DecoderConfig
    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    feats, cart, mask = _inputs()
    variables = model.init(
        jax.random.PRNGKey(2), feats, cart, mask, train=False
    )
    art = tmp_path / "art"
    export_artifact(
        variables, cfg, DecoderConfig(nms_cap=64, num_post_nms=16), art
    )
    p = export_aot(art, batch=1, height=16, width=64)

    from jax import export as jax_export

    restored = jax_export.deserialize(p.read_bytes())
    got = restored.call(feats, cart, mask)
    predict, _, _ = load_artifact(art)
    want = predict(feats, cart, mask)
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.cuboids), np.asarray(want.cuboids), atol=1e-5
    )


def test_compile_cache_persists(tmp_path):
    """load_artifact keeps a persistent XLA compile cache in the artifact
    dir: executing the predict fn populates it, so a later process-level
    reload of the same artifact replays the executable instead of
    recompiling (the serving jit closes over weights — every checkpoint
    is a distinct program)."""
    from export import export_artifact, load_artifact

    cfg = _small_cfg()
    from range_view_3d_detection_tpu.models.detector import Detector

    model = Detector(cfg)
    f, c, m = _inputs()
    variables = model.init(jax.random.PRNGKey(0), f, c, m, train=False)
    from range_view_3d_detection_tpu.models.decoder import DecoderConfig

    dec_cfg = DecoderConfig(nms_cap=64)
    art = tmp_path / "art"
    export_artifact(variables, cfg, dec_cfg, art)
    predict, _, _ = load_artifact(art)
    jax.block_until_ready(predict(f, c, m))
    cache = art / "xla_cache"
    assert cache.is_dir()
    assert any(cache.iterdir()), "compile cache is empty after execution"

def test_points_predict_end_to_end(tmp_path):
    """Raw points -> detections: the fused projection->NMS serving path
    equals rasterize-then-predict composed by hand."""
    from export import (
        _sample_points,
        export_artifact,
        load_artifact,
        make_points_predict,
    )

    from range_view_3d_detection_tpu.data.dataset import (
        AV2_FEATURES,
        width_padding,
    )
    from range_view_3d_detection_tpu.models.decoder import DecoderConfig
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.ops.projection import (
        rasterize_points_jax,
    )

    H, W_sensor = 16, 60
    pad = width_padding(W_sensor, 1)
    assert W_sensor + 2 * pad == 64  # the model width of _small_cfg

    cfg = _small_cfg()
    model = Detector(cfg)
    feats0, cart0, mask0 = _inputs(H=H, W=64)
    variables = model.init(
        jax.random.PRNGKey(2), feats0, cart0, mask0, train=False
    )
    export_artifact(
        variables, cfg, DecoderConfig(nms_cap=64, num_post_nms=16),
        tmp_path / "art",
    )
    predict, det_cfg, _ = load_artifact(tmp_path / "art")

    points_predict, extra = make_points_predict(
        predict,
        sensor_width=W_sensor,
        height=H,
        feature_names=AV2_FEATURES,
    )
    assert extra == ["intensity"]

    xyz, laser, inten = _sample_points(2, 512, H, W_sensor, seed=3)
    got = points_predict(xyz, laser, inten)

    f, c, m = jax.vmap(
        lambda p, ln, i: rasterize_points_jax(
            p, ln, {"intensity": i},
            height=H, width=W_sensor, feature_names=AV2_FEATURES, pad=pad,
        )
    )(xyz, laser, inten)
    want = predict(f, c, m)
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.cuboids), np.asarray(want.cuboids), atol=1e-6
    )
    assert np.isfinite(np.asarray(got.cuboids)).all()

def test_artifact_dataset_meta_roundtrip(tmp_path):
    """Dataset serving facts ship in meta.json and drive the points
    frontend defaults (padding-mode provenance)."""
    import json as _json

    from export import _dataset_meta_from_cfg, export_artifact

    from range_view_3d_detection_tpu.models.decoder import DecoderConfig
    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    feats, cart, mask = _inputs()
    variables = model.init(
        jax.random.PRNGKey(0), feats, cart, mask, train=False
    )
    run_cfg = {
        "dataset": {
            "_train_dataset": {"range_view_config": {}},
            "_val_dataset": {
                "dataset_name": "av2",
                "x_stride": 2,
                "padding_mode": "constant",
                "range_view_config": {
                    "height": 16,
                    "width": 60,
                    "feature_column_names": [
                        "intensity", "range", "x", "y", "z",
                    ],
                },
            },
        }
    }
    meta = _dataset_meta_from_cfg(run_cfg)
    assert meta["padding_mode"] == "constant"
    assert meta["sensor_width"] == 60 and meta["x_stride"] == 2

    export_artifact(
        variables, cfg, DecoderConfig(nms_cap=64), tmp_path / "art",
        dataset_meta=meta,
    )
    on_disk = _json.loads((tmp_path / "art" / "meta.json").read_text())
    assert on_disk["dataset"] == meta

def test_width_sharded_serving_matches_plain(tmp_path):
    """Multi-chip latency mode: width-sharded predict == plain predict."""
    from export import (
        export_artifact,
        load_artifact,
        load_artifact_width_sharded,
    )

    from range_view_3d_detection_tpu.models.decoder import DecoderConfig
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.parallel import make_mesh

    cfg = _small_cfg()
    model = Detector(cfg)
    feats, cart, mask = _inputs(H=16, W=64)
    variables = model.init(
        jax.random.PRNGKey(4), feats, cart, mask, train=False
    )
    export_artifact(
        variables, cfg, DecoderConfig(nms_cap=64, num_post_nms=16),
        tmp_path / "art",
    )

    predict, _, _ = load_artifact(tmp_path / "art", cache=False)
    want = predict(feats, cart, mask)

    mesh = make_mesh(num_data=1, num_model=4)
    sharded, place, det_cfg2, _ = load_artifact_width_sharded(
        tmp_path / "art", mesh, circular=False, cache=False
    )
    assert det_cfg2 == cfg
    got = sharded(*place(feats, cart, mask))

    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.cuboids), np.asarray(want.cuboids), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(got.keep), np.asarray(want.keep)
    )

def test_points_predict_waymo_extras_ordering():
    """Two extra channels (elongation, intensity) map to the right
    feature planes through make_points_predict's arg ordering."""
    from export import make_points_predict

    from range_view_3d_detection_tpu.data.dataset import (
        WAYMO_FEATURES,
        width_padding,
    )

    H, W_sensor = 4, 28  # pads to 32
    pad = width_padding(W_sensor, 1)

    def fake_predict(feats, cart, mask):
        return feats  # the jitted output IS the assembled feature image

    points_predict, extra = make_points_predict(
        fake_predict,
        sensor_width=W_sensor,
        height=H,
        feature_names=WAYMO_FEATURES,
        dataset_name="waymo",
    )
    assert extra == ["elongation", "intensity"]

    n = 16
    rng = np.random.default_rng(0)
    r = rng.uniform(5, 20, (1, n)).astype(np.float32)
    az = rng.uniform(-np.pi, np.pi, (1, n)).astype(np.float32)
    xyz = np.stack(
        [r * np.cos(az), r * np.sin(az), np.zeros_like(r)], axis=-1
    )
    laser = rng.integers(0, H, (1, n)).astype(np.int32)
    elong = np.full((1, n), 7.0, np.float32)
    inten = np.full((1, n), 0.25, np.float32)
    feats = np.asarray(points_predict(xyz, laser, elong, inten))[0]
    mask = feats[..., WAYMO_FEATURES.index("range")] > 0
    # elongation plane carries 7s; intensity plane carries tanh(0.25).
    np.testing.assert_allclose(
        feats[..., WAYMO_FEATURES.index("elongation")][mask], 7.0
    )
    np.testing.assert_allclose(
        feats[..., WAYMO_FEATURES.index("intensity")][mask],
        np.tanh(0.25),
        atol=1e-6,
    )
    assert feats.shape == (H, W_sensor + 2 * pad, len(WAYMO_FEATURES))
