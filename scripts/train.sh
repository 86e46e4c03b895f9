#!/usr/bin/env bash
# Parity with reference scripts/train.sh:
#   bash train.sh <experiment> <num_devices> <epochs> <subsampling_rate>
set -euo pipefail

EXPERIMENT=${1:?usage: train.sh experiment num_devices epochs subsample}
NUM_DEVICES=${2:-1}
EPOCHS=${3:-20}
SUBSAMPLE=${4:-1}

python "$(dirname "$0")/train.py" \
  experiment="$EXPERIMENT" \
  ++trainer.devices="$NUM_DEVICES" \
  ++trainer.max_epochs="$EPOCHS" \
  ++dataset._train_dataset.subsampling_rate="$SUBSAMPLE"
