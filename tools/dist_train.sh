#!/usr/bin/env bash
# Multi-host data-parallel launch (reference tools/dist_train.sh analog).
# JAX needs one process per HOST (not per chip); set the coordinator and
# process count, then every host runs the same command:
#   JAX_COORDINATOR=host0:1234 NUM_PROCESSES=4 PROCESS_ID=$i \
#     bash tools/dist_train.sh fusion_base --infos ... [args]
set -e
CONFIG=$1
shift
export JAX_COORDINATOR_ADDRESS=${JAX_COORDINATOR:?set JAX_COORDINATOR=host:port}
export JAX_NUM_PROCESSES=${NUM_PROCESSES:-1}
export JAX_PROCESS_ID=${PROCESS_ID:-0}
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
