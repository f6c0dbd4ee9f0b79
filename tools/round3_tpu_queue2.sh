#!/bin/bash
# Round-3 TPU queue, take 2: the tunnel wedged right after the flagship run
# (known failure mode, CLAUDE.md "tunnel wedges" protocol — recovers on its
# own in ~30-60 min). Probe every 10 min until the device answers, then run
# the queued single-process work in order:
#
#   1. flagship Elo REFIT (max_cycles 0) — the first fit used a
#      zero-temperature profile and produced degenerate uniform records
#      (see docs/DESIGN.md round-3 note); refits with for_match()
#   2. bench.py
#   3. tools/board_sweep.py
#   4. tools/analysis_bench.py
#
#   nohup bash tools/round3_tpu_queue2.sh > /tmp/queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
BASE=/root/repo/.runs/flagship_b6c96
STAMP=$(date -u +%Y%m%d_%H%M%S)
export JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_r3_${STAMP}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
LOG=/tmp/round3_queue2_${STAMP}.log

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe ok', float((x @ x).sum()))" >> "$LOG" 2>&1
}

for attempt in $(seq 1 24); do
  echo "probe attempt $attempt ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  if probe; then
    echo "tunnel alive" | tee -a "$LOG"
    break
  fi
  if [ "$attempt" -eq 24 ]; then
    echo "tunnel never recovered; giving up" | tee -a "$LOG"
    exit 1
  fi
  sleep 600
done

run_stage() {
  local name="$1"; shift
  local cap="$1"; shift
  echo "=== stage $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "=== stage $name FAILED rc=$rc — stopping ===" | tee -a "$LOG"
    exit "$rc"
  fi
  echo "=== stage $name OK ===" | tee -a "$LOG"
}

run_stage elo_refit 3600 python tools/flagship_run.py "$BASE" 0
run_stage bench 1200 python bench.py
run_stage board_sweep 2400 python tools/board_sweep.py /tmp/board_sweep_r3.json
run_stage analysis_bench 1800 python tools/analysis_bench.py /tmp/analysis_bench_r3.json

echo "=== queue complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
