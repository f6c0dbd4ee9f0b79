#!/usr/bin/env bash
# Two-host DCN launch for the sharded selfplay daemon (SURVEY §2.8 P4-P6;
# BASELINE.json "Scaling" row). Run this script on BOTH hosts:
#
#   host 0:  ./tools/launch_2host.sh 0 <host0-ip> <base-dir> [config]
#   host 1:  ./tools/launch_2host.sh 1 <host0-ip> <base-dir> [config]
#
# jax.distributed is initialized from the env vars below
# (katacoffee_tpu/parallel/mesh.py init_distributed); each process then
# builds the global mesh over all chips of both hosts and the selfplay
# batch is sharded with host-contiguous blocks, so per-step traffic rides
# ICI and only jax.distributed control traffic crosses DCN.
#
# On TPU pod slices created as one multi-host accelerator,
# jax.distributed.initialize() needs no arguments — pass AUTO as the
# coordinator IP to use automatic cluster detection.
set -euo pipefail

PROCESS_ID=${1:?process id (0 or 1)}
COORD_IP=${2:?host0 ip, or AUTO for TPU pod auto-detection}
BASE_DIR=${3:?selfplay base dir (shared filesystem or per-host)}
CONFIG=${4:-configs/selfplay.cfg}

if [ "$COORD_IP" != "AUTO" ]; then
  export JAX_COORDINATOR_ADDRESS="${COORD_IP}:8476"
  export JAX_NUM_PROCESSES=2
  export JAX_PROCESS_ID="$PROCESS_ID"
fi

exec python -m katacoffee_tpu selfplay \
  -output-dir "$BASE_DIR" \
  -config "$CONFIG"
