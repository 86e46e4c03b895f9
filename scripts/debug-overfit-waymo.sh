#!/usr/bin/env bash
# WOD-protocol debug-overfit oracle: single-log 6-channel Waymo-layout
# synthetic overfit, then decode + evaluate_waymo (recall-gap penalty +
# APH live). The Waymo analog of scripts/debug-overfit.sh: convergence on
# the SAME data under the FULL WOD metric stack is the correctness oracle
# (reference: conf/experiment/rv-waymo.yaml + evaluation/evaluate.py:367).
set -euo pipefail

# Corpus sizing matters UNDER THE WOD PROTOCOL: the official recall-gap
# penalty zeroes precision beyond 0.05 of any adjacent-cutoff recall gap,
# so with N ground truths per category each matched detection is a 1/N
# recall step and a perfect detector's AP is capped near N*0.05 when
# N < 20. The oracle therefore needs >=~40 GTs/category (16 sweeps x 8
# boxes / 3 categories) so recall steps sit below the penalty width and
# a converged model can actually read ~1.0 (BENCH_NOTES round-5 "WOD
# overfit oracle"). CYCLIST is generated too — the experiment evaluates
# it, and a GT-less category contributes a hard 0 to mAP.
python - <<'PY'
from range_view_3d_detection_tpu.data.synthetic import generate_dataset
generate_dataset("/tmp/rangebox-waymo-synthetic/sensor",
                 splits={"train": 1, "val": 1}, sweeps_per_log=16,
                 num_boxes=8, height=32, width=250, seed=0,
                 dataset_name="waymo",
                 categories=("VEHICLE", "PEDESTRIAN", "CYCLIST"))
PY

RUN_DIR=/tmp/rangebox-waymo-overfit
rm -rf "$RUN_DIR"

python "$(dirname "$0")/train.py" \
  experiment=rv-waymo-synthetic \
  ++run_dir="$RUN_DIR" \
  ++model.augmentations_config=null \
  ++dataset._val_dataset.split_name=train \
  ++trainer.max_epochs="${1:-20}"

# WOD-protocol scoring of the written prediction shards, twice: the
# official protocol (recall-gap penalty on), and the max_recall_delta=None
# escape hatch. An overfit model's scores saturate near 1.0, so whole
# recall masses cross one score cutoff and the official penalty caps AP
# well below true recall (the official op behaves identically) — the
# unpenalized number is the pipeline-correctness oracle, the penalized one
# is the protocol-faithful report.
echo "=== WOD protocol (official, recall-gap penalty on) ==="
python "$(dirname "$0")/../tools/evaluate.py" \
  --pred-dir "$RUN_DIR/predictions" \
  --gt-dir /tmp/rangebox-waymo-synthetic/sensor/train \
  --dataset waymo
echo "=== WOD protocol, max_recall_delta=None (oracle) ==="
python "$(dirname "$0")/../tools/evaluate.py" \
  --pred-dir "$RUN_DIR/predictions" \
  --gt-dir /tmp/rangebox-waymo-synthetic/sensor/train \
  --dataset waymo --no-recall-gap-penalty
