#!/usr/bin/env python
"""End-to-end accuracy impact of int8 PTQ serving: fp vs int8 CDS/AP.

Completes the int8 evidence chain beyond tensor-level RMS
(tests/test_quantized.py): restore a trained run, export ONE serving
artifact whose activation scales are calibrated on real val batches,
decode the val split through BOTH the fp and the int8 predict paths,
and score each with the same evaluation protocol the trainer uses
(evaluation/av2_eval.py). Prints a per-category table and the mean
AP/CDS deltas.

Intended flow (synthetic, no real datasets in this image):

    python scripts/train.py experiment=rv-synthetic \
        ++model.batch_size=2 ++model.augmentations_config=null \
        ++dataset._val_dataset.split_name=train ++trainer.max_epochs=60
    python tools/quant_accuracy.py --run-dir /tmp/rangebox-tpu

Reference analog: none (the reference has no quantized serving); this
certifies TPU-native headroom against this repo's own fp path at the
metric level that matters (the reference's CDS gate, detector.py:472).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np


def _predict_split(predict, loader, categories, dst: Path) -> None:
    from range_view_3d_detection_tpu.training.loop import flatten_detections
    from range_view_3d_detection_tpu.utils.feather import write_feather

    dst.mkdir(parents=True, exist_ok=True)
    for batch in loader:
        result = predict(batch["features"], batch["cart"], batch["mask"])
        cols = flatten_detections(result, batch["uuids"], categories)
        for log_id, ts in batch["uuids"]:
            m = (cols["log_id"] == log_id) & (cols["timestamp_ns"] == ts)
            shard = {k: (v[m] if len(v) else v) for k, v in cols.items()}
            shard["category"] = shard["category"].astype(str)
            shard["log_id"] = shard["log_id"].astype(str)
            write_feather(dst / f"{log_id}_{ts}.feather", shard)


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--out", default="/tmp/quant_accuracy")
    ap.add_argument(
        "--scope", default="full", choices=("full", "heads")
    )
    ap.add_argument("--calib-batches", type=int, default=2)
    args = ap.parse_args(argv)

    from export import _restore_from_run_dir, export_artifact, load_artifact

    from range_view_3d_detection_tpu.data.dataset import (
        DataLoader,
        RangeViewDataset,
    )
    from range_view_3d_detection_tpu.evaluation import detection_cfg_factory
    from range_view_3d_detection_tpu.evaluation.av2_eval import (
        evaluate_predictions,
    )
    from range_view_3d_detection_tpu.training.builders import (
        build_dataset_config,
    )

    run_dir = Path(args.run_dir)
    out = Path(args.out)
    cfg = json.loads((run_dir / "config.json").read_text())
    variables, det_cfg, dec_cfg = _restore_from_run_dir(run_dir)

    val_split = cfg["dataset"]["_val_dataset"].get("split_name", "val")
    ds = RangeViewDataset(build_dataset_config(cfg, "val"))
    batch_size = int(cfg["model"]["batch_size"])
    categories = []
    for _, cats in sorted(det_cfg.tasks, key=lambda kv: kv[0]):
        categories.extend(sorted(cats))

    # Calibrate on real val batches (not synthetic noise).
    calib = []
    for batch in DataLoader(ds, batch_size, shuffle=False, drop_last=False):
        calib.append((batch["features"], batch["cart"], batch["mask"]))
        if len(calib) >= args.calib_batches:
            break

    art = out / "artifact"
    export_artifact(
        variables,
        det_cfg,
        dec_cfg,
        art,
        quantize_batches=calib,
        quantize_scope=args.scope,
    )

    eval_cfg = detection_cfg_factory(cfg["dataset"].get("dataset_name", "av2"))
    gt_dir = Path(cfg["dataset"]["root_dir"]) / val_split
    results = {}
    for name, quantized in (("fp", False), ("int8", "auto")):
        predict, _, _ = load_artifact(art, quantized=quantized)
        dst = out / f"predictions_{name}"
        loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False)
        _predict_split(predict, loader, categories, dst)
        results[name] = evaluate_predictions(
            dst,
            gt_dir,
            categories=categories,
            max_range_m=eval_cfg.max_range_m,
            eval_only_roi_instances=eval_cfg.eval_only_roi_instances,
            dataset_name=eval_cfg.dataset_name,
        )

    rows = sorted(set(results["fp"]) | set(results["int8"]))
    print(f"{'category':30s} {'AP fp':>8s} {'AP q':>8s} {'CDS fp':>8s} {'CDS q':>8s}")
    deltas_ap, deltas_cds = [], []
    for r in rows:
        fp, q = results["fp"].get(r, {}), results["int8"].get(r, {})
        ap_f, ap_q = fp.get("AP", np.nan), q.get("AP", np.nan)
        cds_f, cds_q = fp.get("CDS", np.nan), q.get("CDS", np.nan)
        print(f"{r:30s} {ap_f:8.4f} {ap_q:8.4f} {cds_f:8.4f} {cds_q:8.4f}")
        if np.isfinite(ap_f) and np.isfinite(ap_q):
            deltas_ap.append(ap_q - ap_f)
        if np.isfinite(cds_f) and np.isfinite(cds_q):
            deltas_cds.append(cds_q - cds_f)
    summary = {
        "scope": args.scope,
        "mean_ap_delta": float(np.mean(deltas_ap)) if deltas_ap else None,
        "mean_cds_delta": float(np.mean(deltas_cds)) if deltas_cds else None,
    }
    print(json.dumps(summary))
    (out / "summary.json").write_text(json.dumps(summary))


if __name__ == "__main__":
    main(sys.argv[1:])
