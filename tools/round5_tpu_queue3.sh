#!/bin/bash
# Round-5 TPU queue, phase 3: kvec A/B -> flagship resume -> winlen ablation.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOG=/tmp/round5_tpu3_${STAMP}.log
echo "log: $LOG"
for i in $(seq 1 72); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >>"$LOG" 2>&1; then
    echo "tunnel up after $i probes ($(date -u +%H:%M:%S))" | tee -a "$LOG"; break
  fi
  [ "$i" = 72 ] && { echo "tunnel never recovered" | tee -a "$LOG"; exit 3; }
  sleep 300
done
export JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_r5c_${STAMP}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
export PYTHONUNBUFFERED=1
run_stage() {
  local name="$1"; shift; local cap="$1"; shift
  echo "=== stage $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  [ "$rc" -ne 0 ] && { echo "stopping" | tee -a "$LOG"; exit "$rc"; }
  sleep 20
}
run_stage kvec_ab 4800 python tools/kvec_ab.py --games 300
run_stage flagship 10800 python tools/flagship_run.py /root/repo/.runs/flagship_b6c96 10 16
run_stage winlen_ablation 3600 python tools/winlen_ablation.py
echo "=== tpu queue3 complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
