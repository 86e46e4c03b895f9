#!/usr/bin/env bash
# Parity with reference scripts/debug-overfit.sh: single-log overfit on the
# synthetic dataset (train split doubles as val), debug mode, batch 2.
set -euo pipefail

python - <<'PY'
from range_view_3d_detection_tpu.data.synthetic import generate_dataset
generate_dataset("/tmp/rangebox-synthetic/sensor",
                 splits={"train": 1, "val": 1}, sweeps_per_log=2,
                 height=32, width=248, seed=0)
PY

# val split = train split (the reference's debug-overfit semantics:
# convergence-to-zero-loss on the SAME data is the correctness oracle).
python "$(dirname "$0")/train.py" \
  experiment=rv-synthetic \
  ++model.debug=true \
  ++model.batch_size=2 \
  ++model.augmentations_config=null \
  ++dataset._val_dataset.split_name=train \
  ++trainer.max_epochs="${1:-20}"
