#!/bin/bash
# Round-5 final-session TPU queue: wait for tunnel recovery, then
#   1. kvec A/B (vectorized K playouts/round: real-chip speed + equal-visit
#      strength match vs K=1)
#   2. segment-length A/B (bench host-sync cadence, 2/4/6 moves per call)
#   3. bench.py (headline)
#   4. flagship resume at the round-5 op point (bounded cycles; syncs
#      artifacts/ every cycle, safe to cut at any point)
# ONE TPU process at a time; every stage under timeout.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOG=/tmp/round5_session_${STAMP}.log
echo "log: $LOG"

for i in $(seq 1 30); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >>"$LOG" 2>&1; then
    echo "tunnel up after $i probes ($(date -u +%H:%M:%S))" | tee -a "$LOG"
    break
  fi
  if [ "$i" = 30 ]; then echo "tunnel never recovered" | tee -a "$LOG"; exit 3; fi
  sleep 100
done

export PYTHONUNBUFFERED=1

run_stage() {
  local name="$1"; shift
  local cap="$1"; shift
  echo "=== stage $name start ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  # keep going on per-stage failure: later stages are independent, and a
  # stage timeout on the flagship loop is the expected way to bound it
  sleep 15
}

run_stage kvec 1800 python tools/kvec_ab.py --games 192
run_stage seglen 1200 python tools/seglen_ab.py
run_stage flagship 2400 python tools/flagship_run.py /root/repo/.runs/flagship_b6c96 12 16
run_stage winlen 2400 python tools/winlen_ablation.py
echo "=== session queue complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
