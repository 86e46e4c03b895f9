#!/usr/bin/env python
"""Latency + accuracy benchmark harness.

Capability parity with the reference ``tools/benchmark.py`` (33-251):
batch-1 validation pass with per-stage timing (backbone+head / decoder /
NMS) using ``block_until_ready`` walls (the TPU analog of
``torch.cuda.synchronize``, benchmark.py:231-238), FPS after warmup, then
full evaluation of the written predictions.

Usage:
    python tools/benchmark.py experiment=rv-synthetic [++key=value ...]
    python tools/benchmark.py --synthetic          # self-contained run
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("benchmark")


def _sync(r):
    """Host readback: guarantees device completion even through remote
    transports where block_until_ready returns early."""
    return float(jax.tree_util.tree_leaves(r)[0].sum())


def bench(fn, *args, iters=20, warmup=5):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_loader(argv):
    """Loader-only throughput: host pipeline frames/s at flagship shapes.

    The device path targets tens of fps/chip; the host loader must
    sustain a multiple of that (SURVEY §7.3 item 6). Measures the full
    ``DataLoader`` iterator (feather decode + augment + pad/stride +
    collate + prefetch) on synthetic flagship-sized sweeps.
    """
    from range_view_3d_detection_tpu.data.dataset import (
        DataLoader,
        DatasetConfig,
        RangeViewConfig,
        RangeViewDataset,
    )
    from range_view_3d_detection_tpu.data.synthetic import generate_dataset

    height = int(next((a.split("=")[1] for a in argv if a.startswith("--height=")), 64))
    width = int(next((a.split("=")[1] for a in argv if a.startswith("--width=")), 1800))
    batch = int(next((a.split("=")[1] for a in argv if a.startswith("--batch=")), 2))
    workers = int(next((a.split("=")[1] for a in argv if a.startswith("--workers=")), 6))
    root = Path(f"/tmp/rangebox-loaderbench/{height}x{width}/sensor")
    if not root.exists():
        generate_dataset(
            root,
            splits={"train": 2},
            sweeps_per_log=16,
            height=height,
            width=width,
            num_bg_points=40000,
            seed=3,
        )
    ds = RangeViewDataset(
        DatasetConfig(
            root_dir=str(root),
            split_name="train",
            range_view=RangeViewConfig(height=height, width=width),
            tasks={0: ("REGULAR_VEHICLE", "PEDESTRIAN")},
            augmentations={
                "flip_azimuth": {"p": 0.5},
                "random_rotation": {"low": -0.785, "high": 0.785, "p": 1.0},
                "random_global_scale": {"low": 0.95, "high": 1.05},
            },
        )
    )
    loader = DataLoader(ds, batch_size=batch, num_workers=workers, shuffle=True)
    # Warm epoch, then timed epochs.
    n_frames = 0
    for b in loader:
        n_frames += b["features"].shape[0]
    t0 = time.perf_counter()
    timed = 0
    epochs = 3
    for _ in range(epochs):
        for b in loader:
            timed += b["features"].shape[0]
    dt = time.perf_counter() - t0
    report = {
        "loader_frames_per_sec": round(timed / dt, 2),
        "shape": [height, width],
        "batch": batch,
        "workers": workers,
        "frames_timed": timed,
    }
    print(json.dumps(report, indent=2))
    return report


def bench_train(argv):
    """Training-step throughput at flagship shapes on the local chip.

    The reference's training perf surface is the 4xA40 recipe
    (``scripts/train.sh``: 4 GPUs x batch 4, bf16-mixed); this measures
    the TPU analog — the full jitted train step (targets + forward +
    loss + backward + AdamW/OneCycle update, donated state) on
    device-resident batches, host-readback walls. Reports steps/s and
    frames/s/chip; multiply by the data-mesh size for cluster
    throughput (the step is SPMD — see parallel/mesh.py).
    """
    import jax.numpy as jnp

    from __graft_entry__ import _dryrun_batch, _flagship_config
    from range_view_3d_detection_tpu.training import optim
    from range_view_3d_detection_tpu.training import state as state_lib

    batch = int(next((a.split("=")[1] for a in argv if a.startswith("--batch=")), 2))
    height = int(next((a.split("=")[1] for a in argv if a.startswith("--height=")), 64))
    width = int(next((a.split("=")[1] for a in argv if a.startswith("--width=")), 1808))
    iters = int(next((a.split("=")[1] for a in argv if a.startswith("--iters=")), 12))
    # Flagship batch>=2 training needs loss-region + per-stage remat on
    # the 16 GB v5e (BENCH_NOTES "loss-region remat"); override with
    # --remat=0/1.
    remat_default = "1" if batch >= 2 else "0"
    remat = (
        next(
            (a.split("=")[1] for a in argv if a.startswith("--remat=")),
            remat_default,
        )
        == "1"
    )

    import dataclasses

    cfg = _flagship_config()
    cfg = dataclasses.replace(cfg, remat=remat)
    host_batch = _dryrun_batch(cfg, batch, height, width, 5)
    # Device-resident inputs: through the remote tunnel H2D is ~25 MB/s,
    # so per-step host batches would measure the transport, not the step.
    device_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    tx, _ = optim.make_optimizer(
        7.5e-4,
        total_steps=1000,
        num_devices=jax.device_count(),
        batch_size=batch,
        use_linear_lr_scaling=True,
    )
    state = state_lib.create_state(
        jax.random.PRNGKey(0), cfg, tx, device_batch
    )
    train_step = state_lib.make_train_step(cfg, tx)

    for _ in range(3):  # compile + warm (donated state: rebind each call)
        state, metrics = train_step(state, device_batch)
    _sync(metrics)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, device_batch)
    _sync(metrics)
    dt = time.perf_counter() - t0

    report = {
        "train_step_ms": round(dt / iters * 1e3, 2),
        "steps_per_sec": round(iters / dt, 3),
        "train_frames_per_sec_per_chip": round(batch * iters / dt, 2),
        "batch": batch,
        "shape": [height, width],
        "remat": bool(cfg.remat),
        "iters": iters,
    }
    print(json.dumps(report, indent=2))
    return report


def main(argv):
    if "--train" in argv:
        bench_train(argv)
        return
    if "--loader" in argv:
        bench_loader(argv)
        return
    from range_view_3d_detection_tpu.data.synthetic import generate_dataset
    from range_view_3d_detection_tpu.evaluation.av2_eval import (
        evaluate_predictions,
    )
    from range_view_3d_detection_tpu.models.decoder import decode
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.training.loop import Trainer
    from range_view_3d_detection_tpu.utils.config import compose

    overrides = [a for a in argv if "=" in a and not a.startswith("experiment=")]
    experiment = next(
        (a.split("=", 1)[1] for a in argv if a.startswith("experiment=")),
        None,
    )
    if "--synthetic" in argv or experiment is None:
        experiment = "rv-synthetic"
        root = Path("/tmp/rangebox-bench/sensor")
        if not root.exists():
            generate_dataset(
                root,
                splits={"train": 1, "val": 1},
                sweeps_per_log=4,
                height=32,
                width=248,
                seed=7,
            )
        overrides += [f"dataset.root_dir={root}", "trainer.max_epochs=1"]

    cfg = compose(REPO / "conf", experiment, overrides)
    trainer = Trainer(cfg)
    state = trainer.fit()

    model = Detector(trainer.det_cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tasks = trainer.det_cfg.tasks_dict
    dec_cfg = trainer.dec_cfg

    batch = next(iter(trainer.val_loader))
    feats = batch["features"][:1]
    cart = batch["cart"][:1]
    mask = batch["mask"][:1]

    fwd = jax.jit(lambda v, f, c, m: model.apply(v, f, c, m, train=False))
    dec_only = jax.jit(
        lambda out: decode(out, dec_cfg, tasks, use_nms=False)
    )
    full = jax.jit(
        lambda v, f, c, m: decode(
            model.apply(v, f, c, m, train=False), dec_cfg, tasks, use_nms=True
        )
    )

    if "--profile" in argv:
        # jax.profiler trace (the TPU analog of the reference's
        # cuda.synchronize walls + nsight; SURVEY §5 tracing gap).
        trace_dir = str(REPO / "profile_trace")
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(full(variables, feats, cart, mask))
        logger.info("profiler trace written to %s", trace_dir)

    t_fwd = bench(fwd, variables, feats, cart, mask)
    out = fwd(variables, feats, cart, mask)
    t_dec = bench(dec_only, out)
    t_full = bench(full, variables, feats, cart, mask)
    t_nms = max(t_full - t_fwd - t_dec, 0.0)

    report = {
        "backbone_head_ms": round(t_fwd * 1e3, 3),
        "decode_ms": round(t_dec * 1e3, 3),
        "nms_ms": round(t_nms * 1e3, 3),
        "e2e_ms": round(t_full * 1e3, 3),
        "fps": round(1.0 / t_full, 2),
    }

    # Projection stage + the full points->NMS chain (the BASELINE.json
    # metric definition spans projection->NMS; the stages above start
    # from pre-projected range images like the reference harness).
    sys.path.insert(0, str(REPO / "tools"))
    from export import _dataset_meta_from_cfg, _sample_points

    from range_view_3d_detection_tpu.data.dataset import width_padding
    from range_view_3d_detection_tpu.ops.projection import (
        rasterize_points_jax,
    )

    ds_meta = _dataset_meta_from_cfg(cfg)
    derived = ("range", "x", "y", "z", "view")
    extras = [n for n in ds_meta["feature_names"] if n not in derived]
    if extras == ["intensity"]:
        pad = width_padding(ds_meta["sensor_width"], ds_meta["x_stride"])
        n_pts = int(
            next(
                (a.split("=")[1] for a in argv if a.startswith("--points=")),
                131072 if ds_meta["sensor_width"] >= 1800 else 32768,
            )
        )
        xyz, laser, inten = _sample_points(
            1, n_pts, ds_meta["height"], ds_meta["sensor_width"]
        )

        def rasterize(x1, l1, i1):
            return rasterize_points_jax(
                x1,
                l1,
                {"intensity": i1},
                height=ds_meta["height"],
                width=ds_meta["sensor_width"],
                feature_names=tuple(ds_meta["feature_names"]),
                dataset_name=ds_meta["dataset_name"],
                x_stride=ds_meta["x_stride"],
                pad=pad,
                padding_mode=ds_meta["padding_mode"],
            )

        proj = jax.jit(jax.vmap(rasterize))
        points_full = jax.jit(
            lambda v, x, l, i: decode(
                model.apply(v, *jax.vmap(rasterize)(x, l, i), train=False),
                dec_cfg,
                tasks,
                use_nms=True,
            )
        )
        t_proj = bench(proj, xyz, laser, inten)
        t_pts = bench(points_full, variables, xyz, laser, inten)
        report["projection_ms"] = round(t_proj * 1e3, 3)
        report["points_e2e_ms"] = round(t_pts * 1e3, 3)
        report["points_fps"] = round(1.0 / t_pts, 2)
        report["num_points"] = n_pts

    pred_dir = trainer.validate()
    metrics = evaluate_predictions(
        pred_dir,
        Path(cfg["dataset"]["root_dir"]) / "val",
        categories=trainer.categories,
    )
    report["metrics"] = {
        k: {m: round(x, 4) for m, x in v.items()} for k, v in metrics.items()
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
