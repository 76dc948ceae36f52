#!/usr/bin/env bash
# Multi-host evaluation launch (reference tools/dist_test.sh analog).
set -e
CONFIG=$1
shift
export JAX_COORDINATOR_ADDRESS=${JAX_COORDINATOR:?set JAX_COORDINATOR=host:port}
export JAX_NUM_PROCESSES=${NUM_PROCESSES:-1}
export JAX_PROCESS_ID=${PROCESS_ID:-0}
python "$(dirname "$0")/test.py" "$CONFIG" "$@"
