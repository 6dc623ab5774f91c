#!/usr/bin/env bash
# SLURM evaluation launcher (reference capability: tools/slurm_test.sh).
# See tools/slurm_train.sh for the env wiring.
#
# Usage: tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
NODES=${NODES:-1}
PORT=${PORT:-29500}
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)

srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
    --ntasks="$NODES" --ntasks-per-node=1 --kill-on-bad-exit=1 \
    bash -c "
      export JAX_NUM_PROCESSES=$NODES
      export JAX_PROCESS_ID=\$SLURM_PROCID
      export JAX_COORDINATOR_ADDRESS=\$(scontrol show hostnames \
          \$SLURM_JOB_NODELIST | head -n1):$PORT
      python '$SCRIPT_DIR/test.py' '$CONFIG' '$CHECKPOINT' $*"
