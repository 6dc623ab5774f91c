#!/usr/bin/env bash
# Multi-process training launcher (reference capability: tools/dist_train.sh,
# which wraps torch.distributed.launch). TPU-native equivalent: spawn
# NPROCS local processes wired together via jax.distributed — on a TPU pod
# slice the runtime provides process env itself, so there you just run
# tools/train.py once per host and this script is only for local testing.
#
# Usage: tools/dist_train.sh CONFIG NPROCS [train.py args...]
set -euo pipefail
CONFIG=$1
NPROCS=$2
shift 2
PORT=${PORT:-29500}
COORD=${COORDINATOR_ADDRESS:-127.0.0.1:$PORT}
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)

pids=()
for ((i = 0; i < NPROCS; i++)); do
  JAX_COORDINATOR_ADDRESS=$COORD \
  JAX_NUM_PROCESSES=$NPROCS \
  JAX_PROCESS_ID=$i \
  python "$SCRIPT_DIR/train.py" "$CONFIG" --launcher jax "$@" &
  pids+=($!)
done
status=0
for pid in "${pids[@]}"; do
  wait "$pid" || status=$?
done
exit $status
