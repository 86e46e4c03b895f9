#!/usr/bin/env python
"""Standalone evaluation CLI: score prediction shards against a GT split.

Usage:
    python tools/evaluate.py --pred-dir RUN/predictions \\
        --gt-dir ~/data/datasets/av2/sensor/val \\
        [--dataset av2|waymo] [--categories A,B,C]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--dataset", default="av2", choices=["av2", "waymo"])
    ap.add_argument("--categories", default=None)
    ap.add_argument(
        "--workers",
        type=int,
        default=None,
        help="process-pool width for the WOD per-sweep Hungarian solves "
        "(default: RV3D_EVAL_WORKERS env var; 0 forces serial)",
    )
    ap.add_argument(
        "--no-recall-gap-penalty",
        action="store_true",
        help="WOD only: evaluate with max_recall_delta=None (the PARITY.md "
        "escape hatch). The official penalty zeroes precision beyond 0.05 "
        "of any adjacent-score-cutoff recall gap, so a detector whose "
        "scores saturate (e.g. a debug-overfit oracle) reads far below "
        "its true recall; this flag separates pipeline correctness from "
        "that protocol property",
    )
    args = ap.parse_args()

    from range_view_3d_detection_tpu.evaluation.av2_eval import (
        _join_valid_uuids,
        annotate_detection_roi,
        dedupe_predictions,
        load_ground_truth,
        load_predictions,
    )

    dts = load_predictions(Path(args.pred_dir))
    gts = load_ground_truth(Path(args.gt_dir))
    dts = dedupe_predictions(dts)
    dts, gts = _join_valid_uuids(dts, gts)
    if args.dataset == "av2":
        # ROI-filter detections too (GT flags come from the converter);
        # otherwise correct detections of off-ROI objects count as FPs.
        dts = annotate_detection_roi(dts, Path(args.gt_dir))
    if args.categories:
        categories = args.categories.split(",")
    else:
        import numpy as np

        categories = sorted(np.unique(gts["category"]).tolist())

    if args.dataset == "av2":
        from range_view_3d_detection_tpu.evaluation.av2_eval import evaluate

        metrics = evaluate(dts, gts, categories)
    else:
        from range_view_3d_detection_tpu.evaluation.waymo_eval import (
            evaluate_waymo,
            mean_ap,
        )

        metrics = evaluate_waymo(
            dts,
            gts,
            categories,
            workers=args.workers,
            **(
                {"max_recall_delta": None}
                if args.no_recall_gap_penalty
                else {}
            ),
        )
        metrics["mAP_L2"] = mean_ap(metrics, level=2)
        metrics["mAPH_L2"] = mean_ap(metrics, level=2, metric="APH")

    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
