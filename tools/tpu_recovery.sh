#!/bin/bash
# TPU-recovery runbook: the queued device-bound work for this round, run
# STRICTLY one process at a time (CLAUDE.md tunnel protocol) with a fresh
# compile-cache subdir, stopping at the first sign of a re-wedge.
#
#   bash tools/tpu_recovery.sh [base_dir]
#
# Stages:
#   1. tunnel sanity probe (matmul, 60s cap)
#   2. bench.py                      -> confirms the 57.5k visits/s headline
#   3. tools/batch_sweep.py          -> delivered visits/s at B=256/512/1024
#   4. tools/flagship_run.py         -> sustained b6c96 loop to 5 promotions
#      (resumable: re-running continues from the models on disk)
set -u
cd "$(dirname "$0")/.."
BASE="${1:-/root/repo/.runs/flagship_b6c96}"
STAMP=$(date -u +%Y%m%d_%H%M%S)
export JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_r2_${STAMP}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
LOG=/tmp/tpu_recovery_${STAMP}.log

run_stage() {
  local name="$1"; shift
  local cap="$1"; shift
  echo "=== stage $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "=== stage $name FAILED rc=$rc — stopping (tunnel may have re-wedged) ===" | tee -a "$LOG"
    exit "$rc"
  fi
}

run_stage probe 120 python -c "
import time, jax
t=time.time(); x=jax.numpy.ones((256,256)); print(float((x@x).sum()), jax.devices(), round(time.time()-t,1),'s')"

run_stage bench 1200 python bench.py
run_stage batch_sweep 3600 python tools/batch_sweep.py 256 512 1024
run_stage flagship 0 python tools/flagship_run.py "$BASE"

echo "=== all stages done ($(date -u +%H:%M:%S)); see $LOG ==="
