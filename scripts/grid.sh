#!/usr/bin/env bash
# Parity with reference scripts/grid.sh: ablation sweeps over IoU-aware
# classification + range subsampling (the grid of the CoRL paper). The
# reference launches these via hydra-submitit MULTIRUN on SLURM; here they
# run sequentially (or submit each line to your cluster launcher).
set -euo pipefail
EXPERIMENT=${1:-rv-av2}

for affinity in GAUSSIAN BEV; do
  for sample_by_range in true false; do
    echo "=== ${EXPERIMENT} affinity=${affinity} sample_by_range=${sample_by_range}"
    python "$(dirname "$0")/train.py" \
      experiment="$EXPERIMENT" \
      ++model._head.targets_config.affinity_fn="$affinity" \
      ++model._decoder.enable_sample_by_range="$sample_by_range"
  done
done
