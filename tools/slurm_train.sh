#!/usr/bin/env bash
# Slurm launch (reference tools/slurm_train.sh analog): one task per host.
#   PARTITION=tpu NODES=4 bash tools/slurm_train.sh fusion_base --infos ...
set -e
PARTITION=${PARTITION:?}
NODES=${NODES:-1}
CONFIG=$1
shift
srun -p "$PARTITION" --nodes="$NODES" --ntasks-per-node=1 --kill-on-bad-exit=1 \
  bash -c 'JAX_COORDINATOR_ADDRESS=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -1):8476 \
    NUM_PROCESSES=$SLURM_NTASKS PROCESS_ID=$SLURM_PROCID \
    python tools/train.py '"$CONFIG $*"
