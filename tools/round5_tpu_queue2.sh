#!/bin/bash
# Round-5 TPU queue, phase 2: wait for tunnel recovery, then the trained-net
# cross-match (v150), the color-asymmetry self-match, and the flagship
# resume (bounded cycles; resumable). ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOG=/tmp/round5_queue2_${STAMP}.log
echo "log: $LOG"

for i in $(seq 1 72); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >>"$LOG" 2>&1; then
    echo "tunnel up after $i probes ($(date -u +%H:%M:%S))" | tee -a "$LOG"
    break
  fi
  if [ "$i" = 72 ]; then echo "tunnel never recovered" | tee -a "$LOG"; exit 3; fi
  sleep 300
done

export JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_r5b_${STAMP}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
export PYTHONUNBUFFERED=1

run_stage() {
  local name="$1"; shift
  local cap="$1"; shift
  echo "=== stage $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  if [ "$rc" -ne 0 ]; then
    echo "stopping (tunnel may have re-wedged)" | tee -a "$LOG"
    exit "$rc"
  fi
  sleep 20
}

run_stage kvec_ab 4800 python tools/kvec_ab.py --games 300
run_stage cross_v150 9000 python tools/cross_match.py --mode samenet \
  --model /root/repo/.runs/refnet_distill/coffee-b6c96-distilled.bin.gz \
  --games 400 --visits 150 --out artifacts/cross_match/samenet_distilled_v150.json
run_stage color_asym 3000 python tools/color_asymmetry_selfmatch.py --games 400 --visits 150
run_stage flagship 14400 python tools/flagship_run.py /root/repo/.runs/flagship_b6c96 12 16
echo "=== queue2 complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
