#!/usr/bin/env bash
# Multi-process evaluation launcher (reference capability:
# tools/dist_test.sh). See tools/dist_train.sh for the TPU-pod story.
#
# Usage: tools/dist_test.sh CONFIG CHECKPOINT NPROCS [test.py args...]
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
NPROCS=$3
shift 3
PORT=${PORT:-29500}
COORD=${COORDINATOR_ADDRESS:-127.0.0.1:$PORT}
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)

pids=()
for ((i = 0; i < NPROCS; i++)); do
  JAX_COORDINATOR_ADDRESS=$COORD \
  JAX_NUM_PROCESSES=$NPROCS \
  JAX_PROCESS_ID=$i \
  python "$SCRIPT_DIR/test.py" "$CONFIG" "$CHECKPOINT" "$@" &
  pids+=($!)
done
status=0
for pid in "${pids[@]}"; do
  wait "$pid" || status=$?
done
exit $status
