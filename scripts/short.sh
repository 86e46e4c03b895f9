#!/usr/bin/env bash
# Parity with reference scripts/short.sh: short-schedule rv-av2 run at
# reduced data (subsampled sweeps).
set -euo pipefail
python "$(dirname "$0")/train.py" \
  experiment=rv-av2 \
  ++trainer.max_epochs=5 \
  ++dataset._train_dataset.subsampling_rate=5
