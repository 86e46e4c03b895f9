#!/usr/bin/env python
"""Scaled int8 accuracy certification: >=500 GT boxes, 3 categories, N seeds.

VERDICT r3 weak #5: the -0.45-pt CDS certification rested on ~100 GT
boxes, where per-run noise is ~10x the 0.5-pt gate. This driver runs the
full chain — synthetic corpus -> train -> calibrate -> fp vs int8 PTQ
predict -> AV2-protocol eval — per seed and reports the PTQ delta as
mean +/- spread across seeds, each measured on a >=500-GT val corpus.

    python tools/quant_cert_scale.py --seeds 3 --epochs 40

Writes per-seed summaries + the aggregate to --out (default
/tmp/quant_cert_scale/cert.json). Reference gate: BASELINE.json's
0.5-pt accuracy window.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

CATEGORIES = ("PEDESTRIAN", "REGULAR_VEHICLE", "BICYCLIST")


def run_seed(
    seed: int,
    work: Path,
    epochs: int,
    verbose: bool,
    qat_steps: int = 0,
    qat_lr: float = 1e-4,
    x_stride_eval: int = 0,
) -> dict:
    from range_view_3d_detection_tpu.data.synthetic import generate_dataset

    root = work / f"sensor_s{seed}"
    run_dir = work / f"run_s{seed}"
    out_dir = work / f"quant_s{seed}"
    done = (
        json.loads((out_dir / "summary.json").read_text())
        if (out_dir / "summary.json").exists()
        else None
    )
    if (
        done is not None
        and (not qat_steps or done.get("qat_steps"))
        and (
            not x_stride_eval
            or done.get(f"mean_cds_delta_fp_x{x_stride_eval}") is not None
        )
    ):
        # Resumable: a completed seed is never re-trained (a PTQ-only
        # summary does NOT satisfy a --qat-steps run, and vice versa is
        # fine — QAT summaries carry the PTQ rows too).
        summary = json.loads((out_dir / "summary.json").read_text())
        from range_view_3d_detection_tpu.evaluation.av2_eval import (
            load_ground_truth,
        )

        gts = load_ground_truth(root / "val")
        summary["num_val_gts"] = int(
            (np.asarray(gts["num_interior_pts"]) > 0).sum()
        )
        return summary
    # val: 3 logs x 24 sweeps x ~8 boxes ~= 576 GTs before point filters.
    generate_dataset(
        root,
        splits={"train": 3, "val": 3},
        sweeps_per_log=24,
        height=32,
        width=248,
        categories=CATEGORIES,
        num_boxes=8,
        num_bg_points=4000,
        seed=seed,
    )

    def sh(args):
        r = subprocess.run(
            args, cwd=REPO, capture_output=not verbose, text=True
        )
        if r.returncode != 0:
            raise RuntimeError(
                f"{' '.join(args[:3])}... rc={r.returncode}\n"
                f"{(r.stdout or '')[-2000:]}\n{(r.stderr or '')[-2000:]}"
            )
        return r

    sh([
        sys.executable, "scripts/train.py",
        "experiment=rv-synthetic",
        f"++dataset.root_dir={root}",
        "++model.tasks={0: [PEDESTRIAN, REGULAR_VEHICLE, BICYCLIST]}",
        "++model.debug=false",
        "++model.train_log_freq=0",
        "++model.augmentations_config=null",
        f"++trainer.max_epochs={epochs}",
        "++trainer.check_val_every_n_epoch=10000",  # eval via quant tool
        f"++run_dir={run_dir}",
        f"++trainer.checkpoint.dir={run_dir}/checkpoints",
    ])
    sh([
        sys.executable, "tools/quant_accuracy.py",
        "--run-dir", str(run_dir),
        "--out", str(out_dir),
        "--calib-batches", "4",
        *(
            ["--qat-steps", str(qat_steps), "--qat-lr", str(qat_lr)]
            if qat_steps
            else []
        ),
        *(
            ["--x-stride-eval", str(x_stride_eval)]
            if x_stride_eval
            else []
        ),
    ])
    summary = json.loads((out_dir / "summary.json").read_text())

    # Count the certification corpus (post point-filter GTs).
    from range_view_3d_detection_tpu.evaluation.av2_eval import (
        load_ground_truth,
    )

    gts = load_ground_truth(root / "val")
    summary["num_val_gts"] = int(
        (np.asarray(gts["num_interior_pts"]) > 0).sum()
    )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--work", default="/tmp/quant_cert_scale")
    ap.add_argument(
        "--qat-steps",
        type=int,
        default=0,
        help="also QAT-fine-tune each seed for N steps and certify the "
        "int8_qat path at the same >=500-GT scale (VERDICT r4 next #7)",
    )
    ap.add_argument("--qat-lr", type=float, default=1e-4)
    ap.add_argument(
        "--x-stride-eval",
        type=int,
        default=0,
        help="also score the fp weights through an x_stride=N val loader "
        "per seed (the fast operating point's accuracy price tag at the "
        "same >=500-GT scale; VERDICT r4 next #2)",
    )
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    per_seed = []
    for seed in range(args.seeds):
        print(f"=== seed {seed} ===", flush=True)
        s = run_seed(
            seed, work, args.epochs, args.verbose,
            qat_steps=args.qat_steps, qat_lr=args.qat_lr,
            x_stride_eval=args.x_stride_eval,
        )
        print(json.dumps(s), flush=True)
        per_seed.append(s)

    ap_d = [s["mean_ap_delta"] for s in per_seed]
    cds_d = [s["mean_cds_delta"] for s in per_seed]
    agg = {
        "seeds": args.seeds,
        "num_val_gts": [s["num_val_gts"] for s in per_seed],
        "ptq_ap_delta_mean": float(np.mean(ap_d)),
        "ptq_ap_delta_spread": float(np.max(ap_d) - np.min(ap_d)),
        "ptq_cds_delta_mean": float(np.mean(cds_d)),
        "ptq_cds_delta_spread": float(np.max(cds_d) - np.min(cds_d)),
        "per_seed": per_seed,
    }
    if args.qat_steps:
        qap = [s["mean_ap_delta_int8_qat"] for s in per_seed]
        qcds = [s["mean_cds_delta_int8_qat"] for s in per_seed]
        agg.update(
            qat_steps=args.qat_steps,
            qat_ap_delta_mean=float(np.mean(qap)),
            qat_ap_delta_spread=float(np.max(qap) - np.min(qap)),
            qat_cds_delta_mean=float(np.mean(qcds)),
            qat_cds_delta_spread=float(np.max(qcds) - np.min(qcds)),
        )
    if args.x_stride_eval:
        key = f"fp_x{args.x_stride_eval}"
        fap = [s[f"mean_ap_delta_{key}"] for s in per_seed]
        fcds = [s[f"mean_cds_delta_{key}"] for s in per_seed]
        agg.update(
            x_stride_eval=args.x_stride_eval,
            fast_ap_delta_mean=float(np.mean(fap)),
            fast_ap_delta_spread=float(np.max(fap) - np.min(fap)),
            fast_cds_delta_mean=float(np.mean(fcds)),
            fast_cds_delta_spread=float(np.max(fcds) - np.min(fcds)),
        )
    print(json.dumps(agg), flush=True)
    (work / "cert.json").write_text(json.dumps(agg, indent=1))


if __name__ == "__main__":
    main()
