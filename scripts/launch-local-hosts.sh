#!/usr/bin/env bash
# Multi-host launch demonstrator: N jax.distributed processes against the
# REAL training entrypoint (scripts/train.py) on localhost.
#
# This is the in-repo analog of the reference's SLURM/submitit launch
# surface (reference conf/config.yaml:25-41): same binary on every host,
# rendezvous through JAX_COORDINATOR_ADDRESS. On a real multi-host TPU
# slice, run the same command on every host with JAX_PROCESS_ID set by
# the scheduler and LAUNCH_PLATFORM=tpu (see docs/DISTRIBUTED.md).
# LAUNCH_PLATFORM (not JAX_PLATFORMS) names the platform so an ambient
# JAX_PLATFORMS export from the surrounding environment cannot leak in.
#
# Usage:
#   NPROC=2 bash scripts/launch-local-hosts.sh [extra train.py overrides]
set -euo pipefail

NPROC="${NPROC:-2}"
PORT="${PORT:-$((20000 + RANDOM % 20000))}"
EXPERIMENT="${EXPERIMENT:-rv-synthetic}"
RUN_DIR="${RUN_DIR:-/tmp/rangebox-multihost}"
ROOT="$(dirname "$0")/.."

# Synthetic data (both processes read the same deterministic tree).
# The package is imported from the repo root (not pip-installed).
export PYTHONPATH="${ROOT}${PYTHONPATH:+:$PYTHONPATH}"
python - <<'PY'
from range_view_3d_detection_tpu.data.synthetic import generate_dataset
generate_dataset("/tmp/rangebox-synthetic/sensor",
                 splits={"train": 2, "val": 2}, sweeps_per_log=2,
                 height=32, width=248, seed=0)
PY

pids=()
for i in $(seq 0 $((NPROC - 1))); do
  JAX_PLATFORMS="${LAUNCH_PLATFORM:-cpu}" \
  JAX_COORDINATOR_ADDRESS="127.0.0.1:${PORT}" \
  JAX_NUM_PROCESSES="${NPROC}" \
  JAX_PROCESS_ID="${i}" \
  python "${ROOT}/scripts/train.py" \
    experiment="${EXPERIMENT}" \
    ++model.debug=true \
    ++model.batch_size=1 \
    ++model.augmentations_config=null \
    ++run_dir="${RUN_DIR}" \
    ++trainer.max_epochs="${MAX_EPOCHS:-1}" \
    "$@" > "${RUN_DIR}.proc${i}.log" 2>&1 &
  pids+=($!)
done

fail=0
for p in "${pids[@]}"; do
  wait "$p" || fail=1
done
for i in $(seq 0 $((NPROC - 1))); do
  echo "--- process ${i} (tail) ---"
  tail -n 4 "${RUN_DIR}.proc${i}.log"
done
exit "$fail"
