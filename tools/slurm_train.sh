#!/usr/bin/env bash
# SLURM training launcher (reference capability: tools/slurm_train.sh).
# One task per host; jax.distributed derives process wiring from the env
# this script exports. GPUS_PER_NODE-style knobs are moot on TPU pods —
# each host sees its local chips automatically.
#
# Usage: tools/slurm_train.sh PARTITION JOB_NAME CONFIG [train.py args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
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
      python '$SCRIPT_DIR/train.py' '$CONFIG' --launcher slurm $*"
