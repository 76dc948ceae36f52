#!/usr/bin/env bash
# Slurm evaluation launch (reference tools/slurm_test.sh analog).
set -e
PARTITION=${PARTITION:?}
NODES=${NODES:-1}
CONFIG=$1
shift
srun -p "$PARTITION" --nodes="$NODES" --ntasks-per-node=1 --kill-on-bad-exit=1 \
  bash -c 'JAX_COORDINATOR_ADDRESS=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -1):8476 \
    NUM_PROCESSES=$SLURM_NTASKS PROCESS_ID=$SLURM_PROCID \
    python tools/test.py '"$CONFIG $*"
