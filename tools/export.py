#!/usr/bin/env python
"""Serving export: a self-contained inference artifact + stream benchmark.

The inference-deployment analog of the reference's checkpoint-restore
predict flow (``tools/benchmark.py:60-63``: wandb artifact pull ->
``Detector.load_from_checkpoint`` -> batch-1 predict). The artifact is a
directory with:

- ``variables.msgpack`` — flax-serialized ``{params, batch_stats}`` with
  every BatchNorm **folded** to a bare affine: the running statistics are
  baked into ``scale' = scale / sqrt(var + eps)`` and
  ``bias' = bias - mean * scale'``, and the stored stats become the
  identity (mean 0, var 1-eps). Eval-mode BN then computes exactly
  ``x * scale' + bias'`` — no statistics ship with the artifact and it
  cannot silently be run with stale ones.
- ``meta.json`` — detector config, decoder config, tasks.

Usage:
    python tools/export.py --run-dir RUN --out ART        # from checkpoint
    python tools/export.py --synthetic --out ART          # fresh init
    python tools/export.py --load ART --bench [--batch N] # stream benchmark
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path
from typing import Optional

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5  # flax BatchNorm epsilon used across the model


def fold_batch_norms(variables):
    """Bake running statistics into BN scale/bias across the pytree.

    Walks params/batch_stats in parallel: any scope with both a BN param
    leaf {scale, bias} and a stats leaf {mean, var} is folded.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    def fold(p, s, scale_k, bias_k, mean_k, var_k):
        inv = np.asarray(p[scale_k]) / np.sqrt(np.asarray(s[var_k]) + EPS)
        p[bias_k] = np.asarray(p[bias_k]) - np.asarray(s[mean_k]) * inv
        p[scale_k] = inv
        s[mean_k] = np.zeros_like(np.asarray(s[mean_k]))
        s[var_k] = np.ones_like(np.asarray(s[var_k])) - EPS

    def walk(p, s):
        if not isinstance(p, dict) or not isinstance(s, dict):
            return
        # flax BatchNorm scopes: {scale, bias} params + {mean, var} stats.
        if "scale" in p and "bias" in p and "mean" in s and "var" in s:
            fold(p, s, "scale", "bias", "mean", "var")
            return
        # MetaKernel's manual stem BNs are flat leaves in one scope:
        # <base>_scale/<base>_bias params + <base>_mean/<base>_var stats.
        for key in list(p):
            if key.endswith("_scale"):
                base = key[: -len("_scale")]
                if (
                    f"{base}_bias" in p
                    and f"{base}_mean" in s
                    and f"{base}_var" in s
                ):
                    fold(
                        p,
                        s,
                        f"{base}_scale",
                        f"{base}_bias",
                        f"{base}_mean",
                        f"{base}_var",
                    )
        for k in p:
            if k in s:
                walk(p[k], s[k])

    walk(params, stats)
    return {"params": params, "batch_stats": stats}


# -- config (de)serialization -------------------------------------------------


def _config_to_meta(det_cfg, dec_cfg) -> dict:
    return {
        "detector_config": dataclasses.asdict(det_cfg),
        "decoder_config": dataclasses.asdict(dec_cfg),
    }


def _dataset_meta_from_cfg(cfg) -> dict:
    """Serving-relevant dataset facts for the artifact (``meta.json``
    "dataset" key): what the raw-points frontend must reproduce so its
    inputs match what the network saw in training (notably the padding
    mode — wrap-padded vs zero-padded azimuth seams differ silently)."""
    d = cfg["dataset"]["_val_dataset"]
    rv = d["range_view_config"]
    names = rv.get("feature_column_names") or cfg["dataset"][
        "_train_dataset"
    ]["range_view_config"].get(
        "feature_column_names", ["intensity", "range", "x", "y", "z"]
    )
    return {
        "dataset_name": str(d["dataset_name"]),
        "height": int(rv["height"]),
        "sensor_width": int(rv["width"]),
        "x_stride": int(d.get("x_stride", 1)),
        "padding_mode": str(d.get("padding_mode", "constant")),
        "feature_names": list(names),
    }


def _detector_config_from_meta(d: dict):
    from range_view_3d_detection_tpu.models.detector import (
        DetectorConfig,
        TargetsConfig,
    )

    d = dict(d)
    d["tasks"] = tuple(
        (int(t), tuple(cats)) for t, cats in d["tasks"]
    )
    d["layers"] = tuple(int(x) for x in d["layers"])
    # Defaults for artifacts written before these fields existed.
    d["stage_blocks"] = tuple(
        int(x) for x in d.get("stage_blocks", (2, 3, 3, 5, 5))
    )
    d["remat_scope"] = tuple(
        str(s)
        for s in d.get("remat_scope", ("stem", "stages", "heads", "loss"))
    )
    d["fpn"] = tuple((int(k), int(v)) for k, v in d["fpn"])
    d["fpn_kernel_sizes"] = tuple(
        (int(k), tuple(int(x) for x in v)) for k, v in d["fpn_kernel_sizes"]
    )
    d["coding_weights"] = tuple(float(x) for x in d["coding_weights"])
    t = dict(d["targets"])
    t["range_partitions"] = tuple(
        (int(k), (float(v[0]), float(v[1]))) for k, v in t["range_partitions"]
    )
    t["point_intervals"] = tuple(
        (int(k), (float(v[0]), float(v[1]))) for k, v in t["point_intervals"]
    )
    d["targets"] = TargetsConfig(**t)
    return DetectorConfig(**d)


def _decoder_config_from_meta(d: dict):
    from range_view_3d_detection_tpu.models.decoder import DecoderConfig

    d = dict(d)
    for k in ("lower_bounds", "upper_bounds"):
        d[k] = tuple(float(x) for x in d[k])
    d["subsampling_rates"] = tuple(int(x) for x in d["subsampling_rates"])
    return DecoderConfig(**d)


# -- export / load ------------------------------------------------------------


def export_artifact(
    variables,
    det_cfg,
    dec_cfg,
    out_dir: Path,
    *,
    quantize_batches=None,
    quantize_scope: str = "full",
    quantize_scales=None,
    dataset_meta=None,
) -> None:
    """Write the serving artifact; optionally add int8 PTQ scales.

    ``quantize_batches``: calibration batches ``[(feats, cart, mask), ...]``
    — when given, per-block activation scales are calibrated on the
    BN-folded model (models/quantized.py) and shipped as ``quant.msgpack``;
    loading then defaults to the int8 serving path. ``quantize_scope``:
    "full" (backbone + heads) or "heads" (towers only).
    ``quantize_scales``: ship this precomputed ``quant`` tree verbatim
    instead of recalibrating (QAT flow: the scales the fine-tune froze
    must be the scales served).
    """
    import flax.serialization

    out_dir.mkdir(parents=True, exist_ok=True)
    folded = fold_batch_norms(jax.device_get(variables))
    (out_dir / "variables.msgpack").write_bytes(
        flax.serialization.msgpack_serialize(folded)
    )
    meta = _config_to_meta(det_cfg, dec_cfg)
    if dataset_meta is not None:
        meta["dataset"] = dataset_meta
    (out_dir / "meta.json").write_text(json.dumps(meta))
    if quantize_scales is not None:
        (out_dir / "quant.msgpack").write_bytes(
            flax.serialization.msgpack_serialize(quantize_scales)
        )
    elif quantize_batches is not None:
        from range_view_3d_detection_tpu.models.detector import Detector
        from range_view_3d_detection_tpu.models.quantized import (
            calibrate_scales,
            filter_scope,
        )

        model = Detector(det_cfg)
        qtree = filter_scope(
            calibrate_scales(model, folded, quantize_batches),
            quantize_scope,
        )
        (out_dir / "quant.msgpack").write_bytes(
            flax.serialization.msgpack_serialize(qtree)
        )
    print(f"artifact written to {out_dir}")


def enable_compile_cache(cache_dir: Path) -> bool:
    """Persistent XLA compile cache for the serving path.

    The serving jit closes over the weights (so the int8 weight
    quantization constant-folds), which makes every checkpoint a distinct
    XLA program — reloading the same artifact in a new process recompiles
    from scratch (~3-4 min through this image's remote-compile tunnel,
    BENCH_NOTES.md). The persistent cache keys on the traced HLO, so a
    second load of the SAME artifact replays the compiled executable.
    Returns False (no-op) when the backend rejects the config.
    """
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        try:
            # The cache backend is a process-level singleton bound to the
            # dir at first use; reset it so loading a SECOND artifact in
            # the same process redirects the cache to that artifact.
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:  # pragma: no cover - jax-version specific
            pass
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return True
    except Exception:  # pragma: no cover - backend/version specific
        return False


def load_artifact(
    art_dir: Path, *, use_nms: bool = True, quantized="auto", cache: bool = True
):
    """Rebuild a jitted end-to-end predict fn from an artifact dir.

    ``quantized``: "auto" takes the int8 path iff the artifact ships
    ``quant.msgpack``; True requires it; False forces the fp path.
    ``cache``: keep a persistent XLA compile cache inside the artifact
    dir so later loads of this artifact skip recompilation.
    """
    import flax.serialization

    from range_view_3d_detection_tpu.models.decoder import decode
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.models.quantized import quantization

    art_dir = Path(art_dir)
    if cache:
        enable_compile_cache(art_dir / "xla_cache")
    meta = json.loads((art_dir / "meta.json").read_text())
    det_cfg = _detector_config_from_meta(meta["detector_config"])
    dec_cfg = _decoder_config_from_meta(meta["decoder_config"])
    tasks = det_cfg.tasks_dict

    variables = flax.serialization.msgpack_restore(
        (art_dir / "variables.msgpack").read_bytes()
    )
    quant_path = art_dir / "quant.msgpack"
    use_q = quant_path.exists() if quantized == "auto" else bool(quantized)
    if use_q:
        qtree = flax.serialization.msgpack_restore(quant_path.read_bytes())
        model = Detector(det_cfg)
        vars_q = dict(variables)
        vars_q["quant"] = qtree

        @jax.jit
        def predict(feats, cart, mask):
            # The context gates tracing: each BN-bearing conv block whose
            # scope ships an in_scale runs the int8 path.
            with quantization("int8"):
                out = model.apply(vars_q, feats, cart, mask, train=False)
            return decode(out, dec_cfg, tasks, use_nms=use_nms)

        return predict, det_cfg, dec_cfg

    model = Detector(det_cfg)

    @jax.jit
    def predict(feats, cart, mask):
        out = model.apply(variables, feats, cart, mask, train=False)
        return decode(out, dec_cfg, tasks, use_nms=use_nms)

    return predict, det_cfg, dec_cfg


def load_artifact_width_sharded(
    art_dir: Path,
    mesh,
    *,
    use_nms: bool = True,
    circular: Optional[bool] = None,
    cache: bool = True,
):
    """Minimum-latency serving: ONE request's azimuth axis sharded over
    the mesh's ``model`` axis (``parallel/spatial.py`` exact per-op halo
    exchange), decode + NMS on the gathered outputs in the same jit.

    The throughput path (`load_artifact`) keeps whole frames per chip and
    scales with the ``data`` axis; this path cuts single-request latency
    by ~the model-axis size instead — the TPU analog of the reference's
    batch-1 fp16 latency mode (``tools/benchmark.py:91-122``), but over
    multiple chips. fp only (the int8 trace quantizes inside the
    shard_map body, which is untested — ship scales are ignored here).

    ``circular``: wrap the azimuth seam; defaults to the artifact's
    recorded padding mode (circular = wrap-padded training).
    """
    import flax.serialization

    from range_view_3d_detection_tpu.models.decoder import decode
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.parallel.spatial import (
        width_sharded_apply,
        width_shardings,
    )

    art_dir = Path(art_dir)
    if cache:
        enable_compile_cache(art_dir / "xla_cache")
    meta = json.loads((art_dir / "meta.json").read_text())
    det_cfg = _detector_config_from_meta(meta["detector_config"])
    dec_cfg = _decoder_config_from_meta(meta["decoder_config"])
    if circular is None:
        circular = (
            meta.get("dataset", {}).get("padding_mode", "circular")
            == "circular"
        )
    variables = flax.serialization.msgpack_restore(
        (art_dir / "variables.msgpack").read_bytes()
    )
    model = Detector(det_cfg)
    tasks = det_cfg.tasks_dict
    sharded_apply = width_sharded_apply(
        model, mesh, circular=circular, train=False
    )

    @jax.jit
    def predict(feats, cart, mask):
        out = sharded_apply(variables, feats, cart, mask)
        return decode(out, dec_cfg, tasks, use_nms=use_nms)

    r4, r3 = width_shardings(mesh)

    def place(feats, cart, mask):
        """Shard one request's inputs width-wise onto the mesh."""
        return (
            jax.device_put(feats, r4),
            jax.device_put(cart, r4),
            jax.device_put(mask, r3),
        )

    return predict, place, det_cfg, dec_cfg


def make_points_predict(
    predict,
    *,
    sensor_width: int,
    height: int,
    feature_names,
    dataset_name: str = "av2",
    x_stride: int = 1,
    padding_mode: str = "circular",
):
    """Compose on-device rasterization in front of a serving predict fn.

    Raw sensor points in, detections out, ONE device program: spherical
    projection + z-buffer + channel assembly (``rasterize_points_jax``)
    fuse into the same jit as forward -> decode -> NMS. This is the
    literal BASELINE.json north-star pipeline ("projection->NMS") as a
    serving API; the range-image predict fn stays available for
    pre-projected inputs (the reference's own serving contract,
    ``tools/benchmark.py:91-122``).

    Returns ``(points_predict, extra_names)``: the jitted fn takes
    ``(xyz (B, N, 3), laser (B, N), *extras)`` with one (B, N) array per
    ``extra_names`` entry (the non-geometric channels, e.g. intensity);
    pad clouds to a static N with zero rows (dropped by the z-buffer's
    min-distance gate).
    """
    from range_view_3d_detection_tpu.data.dataset import width_padding
    from range_view_3d_detection_tpu.ops.projection import (
        rasterize_points_jax,
    )

    pad = width_padding(sensor_width, x_stride)
    derived = ("range", "x", "y", "z", "view")
    extra = [n for n in feature_names if n not in derived]

    @jax.jit
    def points_predict(xyz, laser, *chans):
        def rasterize(xyz1, laser1, *ch1):
            return rasterize_points_jax(
                xyz1,
                laser1,
                dict(zip(extra, ch1)),
                height=height,
                width=sensor_width,
                feature_names=tuple(feature_names),
                dataset_name=dataset_name,
                x_stride=x_stride,
                pad=pad,
                padding_mode=padding_mode,
            )

        feats, cart, mask = jax.vmap(rasterize)(xyz, laser, *chans)
        return predict(feats, cart, mask)

    return points_predict, extra


def _sample_points(B, n, H, W_sensor, seed=0):
    """Synthetic sensor-frame clouds (the points-mode _sample_inputs)."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(5, 60, size=(B, n)).astype(np.float32)
    az = rng.uniform(-np.pi, np.pi, size=(B, n)).astype(np.float32)
    el = rng.uniform(-0.3, 0.1, size=(B, n)).astype(np.float32)
    xyz = np.stack(
        [
            r * np.cos(el) * np.cos(az),
            r * np.cos(el) * np.sin(az),
            r * np.sin(el),
        ],
        axis=-1,
    )
    laser = rng.integers(0, H, size=(B, n)).astype(np.int32)
    intensity = rng.uniform(0, 1, size=(B, n)).astype(np.float32)
    return xyz, laser, intensity


def make_chunked_predict(predict):
    """Device-resident serving loop: one dispatch runs a whole chunk.

    Takes stacked inputs ``(chunk, B, ...)`` and ``lax.scan``s the predict
    fn over the leading axis inside a single jit. Dispatch/tunnel cost is
    paid once per chunk instead of once per micro-batch, and activation
    memory peaks at ONE micro-batch — this is also the bounded-memory way
    to serve large batches on 16 GB HBM (batch 4 = chunk 2 x batch 2).
    """

    @jax.jit
    def run_chunk(*args):
        def step(carry, xs):
            return carry, predict(*xs)

        _, outs = jax.lax.scan(step, 0, args)
        return outs

    return run_chunk


def stream_bench(
    predict,
    *,
    batch: int,
    iters: int,
    H: int,
    W: int,
    C: int,
    chunk: int = 0,
    make_batch=None,
):
    """Batched-stream throughput: issue batches back-to-back and let JAX's
    async dispatch pipeline them.

    The 4 distinct batches are pre-placed on device: this measures the
    accelerator's serving throughput. (Through the remote-TPU tunnel of
    this image, host->device runs at ~25 MB/s and would otherwise dominate;
    on a real TPU VM the PCIe/DMA path feeds far above model rate.)

    ``chunk > 0`` switches to the device-resident serving loop: a single
    jitted ``lax.scan`` runs ``chunk`` micro-batches per dispatch, so the
    per-call host/tunnel dispatch cost is amortized ``chunk``-fold and the
    wall clock converges to device time. This is also the bounded-memory
    path for large serving batches (batch 4 = ``--batch 2 --chunk 2`` per
    request): activation peak stays at one micro-batch.
    """
    from __graft_entry__ import _sample_inputs

    if make_batch is None:
        def make_batch(seed):
            return _sample_inputs(batch, H, W, C, seed=seed)

    def sync(r):
        return float(np.asarray(jax.tree_util.tree_leaves(r)[0]).sum())

    if chunk > 0:
        parts = [make_batch(i) for i in range(chunk)]
        stacked = jax.device_put(
            tuple(
                np.stack([np.asarray(p[j]) for p in parts])
                for j in range(len(parts[0]))
            )
        )

        run_chunk = make_chunked_predict(predict)
        sync(run_chunk(*stacked))  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run_chunk(*stacked)
        sync(out)
        dt = time.perf_counter() - t0
        fps = batch * chunk * iters / dt
        print(
            json.dumps(
                {
                    "stream_frames_per_sec": round(fps, 2),
                    "batch": batch,
                    "chunk": chunk,
                    "iters": iters,
                    "ms_per_microbatch": round(
                        dt / (iters * chunk) * 1e3, 2
                    ),
                }
            )
        )
        return fps

    batches = [
        jax.device_put(tuple(np.asarray(a) for a in make_batch(i)))
        for i in range(4)
    ]

    for b in batches[:2]:
        sync(predict(*b))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = predict(*batches[i % 4])
    sync(out)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "stream_frames_per_sec": round(fps, 2),
                "batch": batch,
                "iters": iters,
                "ms_per_batch": round(dt / iters * 1e3, 2),
            }
        )
    )
    return fps


def latency_bench(
    predict,
    *,
    batch: int,
    iters: int,
    H: int,
    W: int,
    C: int,
    make_batch=None,
):
    """Per-request latency: one dispatch, full host-readback sync per call.

    Unlike ``stream_bench`` (throughput: back-to-back dispatches pipelined
    by async dispatch), this measures the serving-latency operating point
    the reference reports for batch-1 fp16 (``tools/benchmark.py`` staged
    walls): submit one request, wait for its result, record the wall.
    Reports p50/p90/p99 per-request latency.

    Through this image's remote-TPU tunnel each sync pays a ~35 ms
    readback RPC on top of device time, so p50 here is an upper bound;
    the device-side latency floor is the per-op total from
    ``tools/profile_trace.py`` (also printed for context when available
    via the min observed wall). On a real TPU VM (local PCIe) the wall
    converges to device time + sub-ms readback.
    """
    from __graft_entry__ import _sample_inputs

    if make_batch is None:
        def make_batch(seed):
            return _sample_inputs(batch, H, W, C, seed=seed)

    def sync(r):
        return float(np.asarray(jax.tree_util.tree_leaves(r)[0]).sum())

    batches = [
        jax.device_put(tuple(np.asarray(a) for a in make_batch(i)))
        for i in range(4)
    ]

    for b in batches[:2]:  # compile + warm
        sync(predict(*b))

    walls = []
    for i in range(iters):
        b = batches[i % 4]
        t0 = time.perf_counter()
        sync(predict(*b))
        walls.append((time.perf_counter() - t0) * 1e3)
    walls.sort()

    def pct(p):
        # Nearest-rank percentile: ceil(p/100 * n) - 1 (0-indexed).
        n = len(walls)
        return walls[min(n - 1, max(0, -(-p * n // 100) - 1))]

    stats = {
        "latency_ms_p50": round(pct(50), 2),
        "latency_ms_p90": round(pct(90), 2),
        "latency_ms_p99": round(pct(99), 2),
        "latency_ms_min": round(walls[0], 2),
        "batch": batch,
        "iters": iters,
    }
    print(json.dumps(stats))
    return stats


def export_aot(
    art_dir: Path, *, batch: int, height: int, width: int
) -> Path:
    """Serialize the jitted predict fn (weights baked in) via jax.export.

    Produces a portable StableHLO artifact (``predict_bN.stablehlo``)
    that deserializes and runs with ``jax.export.deserialize(...).call``
    on a compatible jax install — no model code, config parsing, or
    Python weights needed at serving time (the AOT analog of the
    reference's TorchScript-able predict path).
    """
    from jax import export as jax_export

    from range_view_3d_detection_tpu.models.decoder import Proposals
    from range_view_3d_detection_tpu.ops.nms import NMSResult

    for nt, name in ((NMSResult, "rv3d.NMSResult"), (Proposals, "rv3d.Proposals")):
        try:
            jax_export.register_namedtuple_serialization(
                nt, serialized_name=name
            )
        except ValueError:
            pass  # already registered

    predict, det_cfg, _ = load_artifact(art_dir)
    C = det_cfg.in_channels
    specs = (
        jax.ShapeDtypeStruct((batch, height, width, C), jnp.float32),
        jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, height, width), jnp.bool_),
    )
    exported = jax_export.export(predict)(*specs)
    out = art_dir / f"predict_b{batch}.stablehlo"
    out.write_bytes(exported.serialize())
    print(f"AOT artifact written to {out} ({out.stat().st_size//1024} KiB)")
    return out


def _eval_shape(cfg) -> tuple:
    """(H, Wp) a run actually evaluates at: configured height and the
    padded + x_stride-decimated width the data layer emits."""
    from range_view_3d_detection_tpu.data.dataset import width_padding

    rv = cfg["dataset"]["_val_dataset"]["range_view_config"]
    H, W = int(rv["height"]), int(rv["width"])
    x_stride = int(cfg["dataset"]["_val_dataset"].get("x_stride", 1))
    Wp = (W + 2 * width_padding(W, x_stride)) // x_stride
    return H, Wp


def _calibration_batches_from_run(run_dir: Path, n: int = 4):
    """Real val batches at the run's eval shapes for PTQ calibration.

    Returns None when the run's dataset is not on disk (the noise
    fallback applies; tools/quant_accuracy.py demonstrates the real-data
    path end-to-end)."""
    import json

    cfg = json.loads((run_dir / "config.json").read_text())
    try:
        from range_view_3d_detection_tpu.data.dataset import RangeViewDataset
        from range_view_3d_detection_tpu.training.builders import (
            build_dataset_config,
        )

        ds = RangeViewDataset(build_dataset_config(cfg, "val"))
    except Exception:
        return None
    if len(ds) == 0:
        return None
    batches = []
    for i in range(min(n, len(ds))):
        item = ds[i]
        batches.append(
            (item["features"][None], item["cart"][None], item["mask"][None])
        )
    return batches


def _restore_from_run_dir(run_dir: Path):
    """Rebuild configs + state from a training run directory (the
    config-in-checkpoint property, ``training/checkpoints.py``)."""
    from range_view_3d_detection_tpu.training import optim
    from range_view_3d_detection_tpu.training.builders import (
        build_decoder_config,
        build_detector_config,
    )
    from range_view_3d_detection_tpu.training.checkpoints import (
        CheckpointManager,
    )
    from range_view_3d_detection_tpu.training.state import create_state

    cfg = json.loads((run_dir / "config.json").read_text())
    det_cfg = build_detector_config(cfg)
    dec_cfg = build_decoder_config(cfg)

    H, Wp = _eval_shape(cfg)
    C = det_cfg.in_channels
    K = det_cfg.max_boxes
    dummy = {
        "features": np.zeros((1, H, Wp, C), np.float32),
        "cart": np.zeros((1, H, Wp, 3), np.float32),
        "mask": np.zeros((1, H, Wp), bool),
        "boxes": np.zeros((1, K, 7), np.float32),
        "box_valid": np.zeros((1, K), bool),
        "box_task": np.zeros((1, K), np.int32),
        "box_offset": np.zeros((1, K), np.int32),
    }
    tx, _ = optim.make_optimizer(1e-3, 100)
    template = create_state(jax.random.PRNGKey(0), det_cfg, tx, dummy)
    mgr = CheckpointManager(run_dir / "checkpoints")
    state, _ = mgr.restore(template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return variables, det_cfg, dec_cfg


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir")
    ap.add_argument("--out")
    ap.add_argument("--load")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--aot", action="store_true")
    ap.add_argument(
        "--batch",
        default="2",
        help="batch size; with --aot a comma list (e.g. 1,2,4) exports "
        "one StableHLO per size",
    )
    ap.add_argument(
        "--chunk",
        type=int,
        default=0,
        help="micro-batches per dispatch (device-resident lax.scan loop)",
    )
    ap.add_argument(
        "--latency",
        action="store_true",
        help="with --load: per-request latency mode (one dispatch + full "
        "sync per call, p50/p90/p99) instead of pipelined throughput",
    )
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=1808)
    ap.add_argument(
        "--points",
        action="store_true",
        help="with --load --bench/--latency: serve raw point clouds — "
        "on-device projection (rasterize_points_jax) fused in front of "
        "the forward, the full BASELINE.json projection->NMS pipeline",
    )
    ap.add_argument(
        "--num-points",
        type=int,
        default=131072,
        help="static cloud size for --points (AV2 sweeps carry ~107k "
        "returns; pad rows are dropped by the z-buffer)",
    )
    ap.add_argument(
        "--sensor-width",
        type=int,
        default=1800,
        help="raw azimuth bins before padding/striding for --points "
        "(AV2 1800, Waymo 2650); must pad/stride to --width. The "
        "artifact's recorded dataset meta takes precedence when present",
    )
    ap.add_argument(
        "--padding-mode",
        default=None,
        choices=("circular", "constant"),
        help="width-padding mode for --points (default: the artifact's "
        "recorded training mode, else circular — the rv flagship "
        "configs; models trained zero-padded MUST serve zero-padded)",
    )
    ap.add_argument(
        "--x-stride",
        type=int,
        default=None,
        help="column decimation for --points (default: the artifact's "
        "recorded stride, else 1). The fast operating point serves "
        "sensor width 1800 at stride 4 -> 464 network columns",
    )
    ap.add_argument(
        "--nms-cap",
        type=int,
        default=1024,
        help="synthetic-export proposal budget (<=4096 takes the "
        "row-blocked Pallas NMS scan; larger budgets take the lax "
        "fallback)",
    )
    ap.add_argument(
        "--quantize",
        nargs="?",
        const="full",
        default=None,
        choices=("full", "heads"),
        help="PTQ the serving forward to int8 at export (calibrated on "
        "synthetic batches at the export shapes): 'full' quantizes the "
        "backbone + head towers, 'heads' only the towers; loading such "
        "an artifact takes the int8 path unless --fp",
    )
    ap.add_argument(
        "--fp",
        action="store_true",
        help="force the fp (bf16) path when loading an artifact that "
        "ships int8 scales",
    )
    args = ap.parse_args(argv)

    if args.load:
        if args.aot:
            # Comma list exports one StableHLO per batch size (serving
            # deployments pick the shape at dispatch time).
            for b in (int(x) for x in str(args.batch).split(",")):
                export_aot(
                    Path(args.load),
                    batch=b,
                    height=args.height,
                    width=args.width,
                )
            return
        predict, det_cfg, dec_cfg = load_artifact(
            Path(args.load), quantized=False if args.fp else "auto"
        )
        batch = int(str(args.batch).split(",")[0])
        make_batch = None
        if args.points:
            from range_view_3d_detection_tpu.data.dataset import (
                AV2_FEATURES,
                WAYMO_FEATURES,
                width_padding,
            )

            # Serving facts from the artifact (what the network trained
            # with — notably the padding mode); CLI flags override.
            ds_meta = json.loads(
                (Path(args.load) / "meta.json").read_text()
            ).get("dataset", {})
            names = tuple(
                ds_meta.get(
                    "feature_names",
                    AV2_FEATURES
                    if det_cfg.in_channels == len(AV2_FEATURES)
                    else WAYMO_FEATURES,
                )
            )
            sensor_w = int(ds_meta.get("sensor_width", args.sensor_width))
            height = int(ds_meta.get("height", args.height))
            x_stride = (
                args.x_stride
                if args.x_stride is not None
                else int(ds_meta.get("x_stride", 1))
            )
            padding_mode = args.padding_mode or ds_meta.get(
                "padding_mode", "circular"
            )
            pad = width_padding(sensor_w, x_stride)
            if (sensor_w + 2 * pad) // x_stride != args.width:
                raise SystemExit(
                    f"sensor width {sensor_w} pads/strides to "
                    f"{(sensor_w + 2 * pad) // x_stride}, not --width "
                    f"{args.width}"
                )
            predict, extra = make_points_predict(
                predict,
                sensor_width=sensor_w,
                height=height,
                feature_names=names,
                dataset_name=ds_meta.get("dataset_name", "av2"),
                x_stride=x_stride,
                padding_mode=padding_mode,
            )
            if extra and extra != ["intensity"]:
                raise SystemExit(
                    f"synthetic points mode only fills intensity, not {extra}"
                )

            def make_batch(seed):
                xyz, laser, inten = _sample_points(
                    batch, args.num_points, height, sensor_w, seed=seed
                )
                return (xyz, laser, inten) if extra else (xyz, laser)

        if args.latency:
            latency_bench(
                predict,
                batch=batch,
                iters=args.iters,
                H=args.height,
                W=args.width,
                C=det_cfg.in_channels,
                make_batch=make_batch,
            )
            return
        if args.bench:
            stream_bench(
                predict,
                batch=batch,
                iters=args.iters,
                H=args.height,
                W=args.width,
                C=det_cfg.in_channels,
                chunk=args.chunk,
                make_batch=make_batch,
            )
        return

    if args.synthetic:
        from __graft_entry__ import _flagship_config, _sample_inputs
        from range_view_3d_detection_tpu.models.decoder import DecoderConfig
        from range_view_3d_detection_tpu.models.detector import Detector

        det_cfg = _flagship_config()
        model = Detector(det_cfg)
        f, c, m = _sample_inputs(1, args.height, args.width, 5)
        variables = model.init(
            jax.random.PRNGKey(0),
            np.asarray(f),
            np.asarray(c),
            np.asarray(m),
            train=False,
        )
        dec_cfg = DecoderConfig(nms_cap=args.nms_cap)
        # The synthetic flagship is rv-av2-shaped: record its serving
        # facts when the shapes match (AV2 64x1800 pads to 1808).
        dataset_meta = (
            {
                "dataset_name": "av2",
                "height": args.height,
                "sensor_width": 1800,
                "x_stride": 1,
                "padding_mode": "circular",
                "feature_names": [
                    "intensity", "range", "x", "y", "z",
                ],
            }
            if (args.height, args.width) == (64, 1808)
            else None
        )
    else:
        variables, det_cfg, dec_cfg = _restore_from_run_dir(
            Path(args.run_dir)
        )
        dataset_meta = _dataset_meta_from_cfg(
            json.loads((Path(args.run_dir) / "config.json").read_text())
        )

    quantize_batches = None
    if args.quantize:
        calib_h, calib_w = args.height, args.width
        if args.run_dir and not args.synthetic:
            # Calibrate at the run's REAL eval shape (padded + strided
            # width) and on real val data when the run's dataset is on
            # disk — noise at the wrong width would silently misstate
            # activation ranges in the shipped scales.
            import json as _json

            cfg_run = _json.loads(
                (Path(args.run_dir) / "config.json").read_text()
            )
            calib_h, calib_w = _eval_shape(cfg_run)
            quantize_batches = _calibration_batches_from_run(
                Path(args.run_dir)
            )
        if quantize_batches is None:
            if args.run_dir and not args.synthetic:
                print(
                    "warning: run dataset not on disk; calibrating int8 "
                    f"scales on synthetic noise at {calib_h}x{calib_w}"
                )
            from __graft_entry__ import _sample_inputs as _si

            quantize_batches = [
                tuple(
                    np.asarray(a)
                    for a in _si(
                        1, calib_h, calib_w, det_cfg.in_channels, seed=s
                    )
                )
                for s in range(4)
            ]
    export_artifact(
        variables,
        det_cfg,
        dec_cfg,
        Path(args.out),
        quantize_batches=quantize_batches,
        quantize_scope=args.quantize or "full",
        dataset_meta=dataset_meta,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
