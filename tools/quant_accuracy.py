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

# Honor JAX_PLATFORMS before any jax-touching import: this image's
# sitecustomize pins the axon tunnel from inside the process, so the env
# var alone does not select CPU (scripts/train.py does the same).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

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


def _qat_finetune(variables, det_cfg, cfg, qtree, *, steps: int, lr: float):
    """STE fake-quant fine-tune (frozen activation scales, live weights).

    Runs ``steps`` ordinary train steps whose forward goes through the
    "qat" context (models/quantized.py): every scale-bearing conv sees
    its serving-time quantize-dequantize error, so the optimizer moves
    the weights to compensate. Returns the fine-tuned variables.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from range_view_3d_detection_tpu.data.dataset import (
        DataLoader,
        RangeViewDataset,
    )
    from range_view_3d_detection_tpu.training.builders import (
        build_dataset_config,
    )
    from range_view_3d_detection_tpu.training.state import (
        TrainState,
        make_train_step,
    )

    tx = optax.chain(
        optax.clip_by_global_norm(35.0), optax.adamw(learning_rate=lr)
    )
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
    step_fn = make_train_step(det_cfg, tx, quant_tree=qtree)

    ds = RangeViewDataset(build_dataset_config(cfg, "train"))
    batch_size = int(cfg["model"]["batch_size"])
    done = 0
    while done < steps:
        for batch in DataLoader(ds, batch_size, shuffle=True, drop_last=True):
            arrays = {
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            }
            state, metrics = step_fn(state, arrays)
            done += 1
            if done % 10 == 0 or done == 1:
                print(f"qat step {done}/{steps} loss={float(metrics['loss']):.4f}")
            if done >= steps:
                break
    return {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--out", default="/tmp/quant_accuracy")
    ap.add_argument(
        "--scope", default="full", choices=("full", "heads")
    )
    ap.add_argument("--calib-batches", type=int, default=2)
    ap.add_argument(
        "--qat-steps",
        type=int,
        default=0,
        help="quantization-aware fine-tune steps before the int8 export "
        "(STE fake-quant forward, frozen activation scales; "
        "training/state.py::make_train_step(quant_tree=...)); adds an "
        "int8_qat row to the comparison",
    )
    ap.add_argument("--qat-lr", type=float, default=1e-4)
    ap.add_argument(
        "--x-stride-eval",
        type=int,
        default=0,
        help="also serve the SAME fp weights through an x_stride=N val "
        "loader and score it (fp_xN row): the accuracy price tag of the "
        "fast operating point (the reference's own latency knob, "
        "prototype/loader.py:792-815 subsample_range_view; its paper "
        "ablates x_stride). The model is fully convolutional, so the "
        "full-width weights serve decimated columns unchanged",
    )
    args = ap.parse_args(argv)

    from export import (
        _restore_from_run_dir,
        export_artifact,
        fold_batch_norms,
        load_artifact,
    )

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

    # Calibrate ONCE on the BN-folded eval model; the same frozen scales
    # feed the PTQ export, the QAT fine-tune, and the QAT export (QAT's
    # contract: the scales the fine-tune optimized against are the
    # scales served).
    import jax

    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_scales,
        filter_scope,
    )

    model = Detector(det_cfg)
    folded = fold_batch_norms(jax.device_get(variables))
    qtree = filter_scope(
        calibrate_scales(model, folded, calib), args.scope
    )

    art = out / "artifact"
    export_artifact(
        variables, det_cfg, dec_cfg, art, quantize_scales=qtree
    )

    runs = [("fp", art, False, ds), ("int8", art, "auto", ds)]
    if args.x_stride_eval > 1:
        import dataclasses

        from range_view_3d_detection_tpu.training.builders import (
            build_dataset_config as _bdc,
        )

        ds_fast = RangeViewDataset(
            dataclasses.replace(
                _bdc(cfg, "val"), x_stride=args.x_stride_eval
            )
        )
        runs.append((f"fp_x{args.x_stride_eval}", art, False, ds_fast))
    if args.qat_steps > 0:
        qat_vars = _qat_finetune(
            variables,
            det_cfg,
            cfg,
            qtree,
            steps=args.qat_steps,
            lr=args.qat_lr,
        )
        art_qat = out / "artifact_qat"
        export_artifact(
            qat_vars, det_cfg, dec_cfg, art_qat, quantize_scales=qtree
        )
        runs.append(("int8_qat", art_qat, "auto", ds))

    eval_cfg = detection_cfg_factory(cfg["dataset"].get("dataset_name", "av2"))
    gt_dir = Path(cfg["dataset"]["root_dir"]) / val_split
    results = {}
    for name, art_dir, quantized, run_ds in runs:
        predict, _, _ = load_artifact(art_dir, quantized=quantized)
        dst = out / f"predictions_{name}"
        loader = DataLoader(
            run_ds, batch_size, shuffle=False, drop_last=False
        )
        _predict_split(predict, loader, categories, dst)
        results[name] = evaluate_predictions(
            dst,
            gt_dir,
            categories=categories,
            max_range_m=eval_cfg.max_range_m,
            eval_only_roi_instances=eval_cfg.eval_only_roi_instances,
            dataset_name=eval_cfg.dataset_name,
        )

    names = [name for name, *_ in runs]
    rows = sorted(set().union(*(results[n] for n in names)))
    hdr = " ".join(
        f"{'AP ' + n:>10s} {'CDS ' + n:>10s}" for n in names
    )
    print(f"{'category':30s} {hdr}")
    deltas = {n: {"AP": [], "CDS": []} for n in names[1:]}
    for r in rows:
        cells = []
        fp = results["fp"].get(r, {})
        for n in names:
            m = results[n].get(r, {})
            cells.append(
                f"{m.get('AP', np.nan):10.4f} {m.get('CDS', np.nan):10.4f}"
            )
            if n != "fp":
                for metric in ("AP", "CDS"):
                    a, b = fp.get(metric, np.nan), m.get(metric, np.nan)
                    if np.isfinite(a) and np.isfinite(b):
                        deltas[n][metric].append(b - a)
        print(f"{r:30s} " + " ".join(cells))
    summary = {"scope": args.scope, "qat_steps": args.qat_steps}
    for n, d in deltas.items():
        summary[f"mean_ap_delta_{n}"] = (
            float(np.mean(d["AP"])) if d["AP"] else None
        )
        summary[f"mean_cds_delta_{n}"] = (
            float(np.mean(d["CDS"])) if d["CDS"] else None
        )
    # Back-compat keys (BENCH_NOTES quotes these for the PTQ point).
    summary["mean_ap_delta"] = summary.get("mean_ap_delta_int8")
    summary["mean_cds_delta"] = summary.get("mean_cds_delta_int8")
    print(json.dumps(summary))
    (out / "summary.json").write_text(json.dumps(summary))


if __name__ == "__main__":
    main(sys.argv[1:])
