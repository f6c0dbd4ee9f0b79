#!/bin/bash
# Round-3 device-bound work queue. Waits for the flagship run (the single
# live TPU process) to EXIT, and only if it completed (flagship_elos.json
# written — 5 promotions reached) runs the queued single-process TPU work:
#
#   1. tunnel sanity probe (matmul, 90s cap)
#   2. bench.py                  -> headline visits/s re-confirmation
#   3. tools/board_sweep.py      -> 5x5/7x7/9x9/10x10 generality sweep
#   4. tools/analysis_bench.py   -> analysis-serving positions/s
#
# If the flagship exited WITHOUT its Elo table the queue stops so the
# operator can resume it instead (tools/flagship_run.py <base_dir>).
#
#   nohup bash tools/round3_tpu_queue.sh <flagship_pid> > /tmp/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
FLAGSHIP_PID="${1:?usage: round3_tpu_queue.sh <flagship_pid>}"
BASE=/root/repo/.runs/flagship_b6c96
STAMP=$(date -u +%Y%m%d_%H%M%S)
export JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_r3_${STAMP}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
LOG=/tmp/round3_queue_${STAMP}.log

echo "waiting for flagship pid ${FLAGSHIP_PID} to exit..." | tee -a "$LOG"
while kill -0 "$FLAGSHIP_PID" 2>/dev/null; do sleep 30; done
sleep 10

if [ ! -f "$BASE/flagship_elos.json" ]; then
  echo "flagship exited WITHOUT flagship_elos.json — not running the queue;" | tee -a "$LOG"
  echo "resume with: python tools/flagship_run.py $BASE" | tee -a "$LOG"
  exit 1
fi
echo "flagship complete; starting queue ($(date -u +%H:%M:%S))" | tee -a "$LOG"

run_stage() {
  local name="$1"; shift
  local cap="$1"; shift
  echo "=== stage $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "=== stage $name FAILED rc=$rc — stopping (tunnel may have wedged) ===" | tee -a "$LOG"
    exit "$rc"
  fi
  echo "=== stage $name OK ===" | tee -a "$LOG"
}

run_stage probe 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe ok', float((x @ x).sum()), jax.devices())"

run_stage bench 1200 python bench.py
run_stage board_sweep 2400 python tools/board_sweep.py /tmp/board_sweep_r3.json
run_stage analysis_bench 1800 python tools/analysis_bench.py /tmp/analysis_bench_r3.json

echo "=== queue complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
