#!/bin/bash
# Round-5 TPU queue: wait for the axon tunnel to recover, then drain the
# device-bound work STRICTLY one process at a time (CLAUDE.md tunnel
# protocol), fresh compile-cache subdir, stopping on first failure.
#
#   bash tools/round5_tpu_queue.sh
#
# Stages: probe-loop -> bench (new compact-lane headline) -> phase split ->
# refnet distill -> export parity check (cpu) -> samenet-distilled
# cross-match v150 -> color-asymmetry self-match -> samenet-distilled v600.
# The flagship resume is intentionally NOT here (long-running; launched and
# stopped under manual control).
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOG=/tmp/round5_queue_${STAMP}.log
echo "log: $LOG"

# 1. wait for the tunnel (probe every 5 min, 60s cap each)
for i in $(seq 1 60); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >>"$LOG" 2>&1; then
    echo "tunnel up after $i probes ($(date -u +%H:%M:%S))" | tee -a "$LOG"
    break
  fi
  if [ "$i" = 60 ]; then echo "tunnel never recovered" | tee -a "$LOG"; exit 3; fi
  sleep 300
done

export JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_r5_${STAMP}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

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
}

run_stage bench 1500 python bench.py
run_stage phase_split 2400 env KC_JAX_CACHE="/root/repo/.jax_cache_phase_${STAMP}" python tools/bench_breakdown.py
run_stage distill 3600 python tools/refnet_distill.py 3000 256
run_stage export_check 1800 env KC_PLATFORM=cpu python tools/refnet_export_check.py
run_stage cross_v150 7200 python tools/cross_match.py --mode samenet \
  --model /root/repo/.runs/refnet_distill/coffee-b6c96-distilled.bin.gz \
  --games 400 --visits 150 --out artifacts/cross_match/samenet_distilled_v150.json
run_stage color_asym 2400 python tools/color_asymmetry_selfmatch.py --games 400 --visits 150
run_stage cross_v600 10800 python tools/cross_match.py --mode samenet \
  --model /root/repo/.runs/refnet_distill/coffee-b6c96-distilled.bin.gz \
  --games 200 --visits 600 --out artifacts/cross_match/samenet_distilled_v600.json
echo "=== queue complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
