#!/usr/bin/env python
"""End-to-end scale drill: 1k-sweep val corpus through the serving +
evaluation pipeline, with per-stage walls.

VERDICT r3 next #10: before the first real-data run, measure every
host-side stage at validation scale so there are no unknown cliffs:
loader iteration, device predict, shard writes, and BOTH evaluation
protocols. Model weights are random — detection quality is irrelevant
to pipeline walls; decode caps bound the det count per sweep.

    python tools/scale_drill.py --sweeps 1000 [--eval-workers N]

Prints one table row per stage (and appends a JSON line to --out).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=1000)
    ap.add_argument("--logs", type=int, default=10)
    ap.add_argument("--eval-workers", type=int, default=0)
    ap.add_argument(
        "--dense",
        action="store_true",
        help="min_confidence=0 + post-NMS cap 200/sweep: random weights sit "
        "below the 0.1 confidence floor (focal prior bias), which starves "
        "the evaluators; dense mode gives them a realistic det load.",
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="Force the CPU backend in-process. The JAX_PLATFORMS env "
        "var is NOT sufficient on axon images: the baked sitecustomize "
        "(axon.register) pins jax_platforms='axon,cpu' from inside the "
        "process, so an env prefix is silently overridden and predict "
        "runs on the tunneled TPU (BENCH_NOTES round-4 drill note).",
    )
    ap.add_argument("--work", default="/tmp/scale_drill")
    ap.add_argument("--out", default="/tmp/scale_drill/walls.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from range_view_3d_detection_tpu.data.dataset import (
        DataLoader,
        RangeViewDataset,
    )
    from range_view_3d_detection_tpu.data.synthetic import generate_dataset
    from range_view_3d_detection_tpu.evaluation.av2_eval import (
        evaluate_predictions,
        load_ground_truth,
        load_predictions,
    )
    from range_view_3d_detection_tpu.evaluation.waymo_eval import (
        evaluate_waymo,
    )
    from range_view_3d_detection_tpu.models.decoder import DecoderConfig, decode
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.training.builders import (
        build_dataset_config,
    )
    from range_view_3d_detection_tpu.training.loop import flatten_detections
    from range_view_3d_detection_tpu.utils.config import compose
    from range_view_3d_detection_tpu.utils.feather import write_feather

    work = Path(args.work)
    walls = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                walls[name] = round(time.perf_counter() - self.t0, 2)
                print(f"{name:28s} {walls[name]:9.2f} s", flush=True)

        return _T()

    per_log = max(1, args.sweeps // args.logs)
    with stage("generate corpus"):
        root = generate_dataset(
            work / "sensor",
            splits={"val": args.logs},
            sweeps_per_log=per_log,
            height=32,
            width=248,
            num_boxes=8,
            num_bg_points=4000,
            seed=0,
        )

    cfg = compose(
        REPO / "conf",
        "rv-synthetic",
        [f"dataset.root_dir={root}", f"run_dir={work}/run"],
    )
    ds = RangeViewDataset(build_dataset_config(cfg, "val"))
    n = len(ds)
    print(f"corpus: {n} sweeps", flush=True)

    with stage("loader pass (no device)"):
        loader = DataLoader(ds, 2, shuffle=False, drop_last=False)
        frames = sum(
            len(b["uuids"]) for b in loader
        )
    walls["loader_frames_per_s"] = round(frames / walls["loader pass (no device)"], 1)

    from range_view_3d_detection_tpu.training.builders import (
        build_decoder_config,
        build_detector_config,
    )

    det_cfg = build_detector_config(cfg)
    dec_cfg = build_decoder_config(cfg)
    if args.dense:
        import dataclasses

        dec_cfg = dataclasses.replace(
            dec_cfg, min_confidence=0.0, num_post_nms=200
        )
    model = Detector(det_cfg)
    categories = []
    for _, cats in sorted(det_cfg.tasks, key=lambda kv: kv[0]):
        categories.extend(sorted(cats))

    b0 = next(iter(DataLoader(ds, 2, shuffle=False, drop_last=False)))
    variables = model.init(
        jax.random.PRNGKey(0), b0["features"], b0["cart"], b0["mask"],
        train=False,
    )
    tasks = det_cfg.tasks_dict

    @jax.jit
    def predict(feats, cart, mask):
        out = model.apply(variables, feats, cart, mask, train=False)
        return decode(out, dec_cfg, tasks, use_nms=True)

    r = predict(b0["features"], b0["cart"], b0["mask"])  # compile
    jax.block_until_ready(r.keep)

    pred_dir = work / "predictions"
    pred_dir.mkdir(parents=True, exist_ok=True)
    # Predict vs host post-process vs shard-write walls are attributed
    # separately (the round-4 1k run's single 105 s stage was opaque).
    t_pred = t_host = 0.0
    with stage("predict + shard writes"):
        loader = DataLoader(ds, 2, shuffle=False, drop_last=False)
        for batch in loader:
            t0 = time.perf_counter()
            result = predict(batch["features"], batch["cart"], batch["mask"])
            jax.block_until_ready(result.keep)
            t_pred += time.perf_counter() - t0
            t0 = time.perf_counter()
            cols = flatten_detections(result, batch["uuids"], categories)
            for log_id, ts in batch["uuids"]:
                m = (cols["log_id"] == log_id) & (cols["timestamp_ns"] == ts)
                shard = {k: (v[m] if len(v) else v) for k, v in cols.items()}
                shard["category"] = shard["category"].astype(str)
                shard["log_id"] = shard["log_id"].astype(str)
                write_feather(pred_dir / f"{log_id}_{ts}.feather", shard)
            t_host += time.perf_counter() - t0
    walls["predict (device, s)"] = round(t_pred, 2)
    walls["flatten + shard writes (s)"] = round(t_host, 2)
    walls["predict_frames_per_s"] = round(
        frames / walls["predict + shard writes"], 1
    )

    with stage("AV2 protocol eval"):
        res = evaluate_predictions(
            pred_dir, root / "val", categories=categories
        )
    walls["av2_mAP"] = round(res["AVERAGE_METRICS"]["AP"], 4)

    with stage("load frames for WOD"):
        dts = load_predictions(pred_dir)
        gts = load_ground_truth(root / "val")
    print(f"dets={len(dts['score'])} gts={len(gts['tx_m'])}", flush=True)

    with stage(f"WOD protocol eval (w={args.eval_workers})"):
        wod = evaluate_waymo(
            dts,
            gts,
            categories,
            workers=args.eval_workers,
        )
    from range_view_3d_detection_tpu.evaluation.waymo_eval import mean_ap

    walls["wod_mAP_L2"] = round(mean_ap(wod, level=2), 4)
    walls["wod_mAPH_L2"] = round(mean_ap(wod, level=2, metric="APH"), 4)
    walls["num_dets"] = int(len(dts["score"]))
    walls["num_gts"] = int(len(gts["tx_m"]))
    walls["sweeps"] = n

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(walls) + "\n")
    print(json.dumps(walls), flush=True)


if __name__ == "__main__":
    main()
