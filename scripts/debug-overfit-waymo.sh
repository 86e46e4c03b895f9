#!/usr/bin/env bash
# WOD-protocol debug-overfit oracle: single-log 6-channel Waymo-layout
# synthetic overfit, then decode + evaluate_waymo (recall-gap penalty +
# APH live). The Waymo analog of scripts/debug-overfit.sh: convergence on
# the SAME data under the FULL WOD metric stack is the correctness oracle
# (reference: conf/experiment/rv-waymo.yaml + evaluation/evaluate.py:367).
set -euo pipefail

python - <<'PY'
from range_view_3d_detection_tpu.data.synthetic import generate_dataset
generate_dataset("/tmp/rangebox-waymo-synthetic/sensor",
                 splits={"train": 1, "val": 1}, sweeps_per_log=2,
                 height=32, width=250, seed=0, dataset_name="waymo",
                 categories=("VEHICLE", "PEDESTRIAN"))
PY

RUN_DIR=/tmp/rangebox-waymo-overfit
rm -rf "$RUN_DIR"

python "$(dirname "$0")/train.py" \
  experiment=rv-waymo-synthetic \
  ++run_dir="$RUN_DIR" \
  ++model.augmentations_config=null \
  ++dataset._val_dataset.split_name=train \
  ++trainer.max_epochs="${1:-20}"

# WOD-protocol scoring of the written prediction shards (the train CLI's
# built-in eval is AV2-protocol; this is the loop the oracle certifies).
python "$(dirname "$0")/../tools/evaluate.py" \
  --pred-dir "$RUN_DIR/predictions" \
  --gt-dir /tmp/rangebox-waymo-synthetic/sensor/train \
  --dataset waymo
