#!/bin/bash
# Round-5 CPU queue: the cross-engine matches + color-asymmetry self-match,
# all on JAX-CPU (0.18 s/150-visit move measured — the tunneled-TPU path was
# latency-bound at B=1, and this decouples the strength evidence from the
# wedge-prone tunnel).
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOG=/tmp/round5_cpu_${STAMP}.log
echo "log: $LOG"
export PYTHONUNBUFFERED=1
run_stage() {
  local name="$1"; shift; local cap="$1"; shift
  echo "=== stage $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  [ "$rc" -ne 0 ] && exit "$rc"
  sleep 5
}
run_stage cross_v150 14400 python tools/cross_match.py --mode samenet --platform cpu \
  --model /root/repo/.runs/refnet_distill/coffee-b6c96-distilled.bin.gz \
  --games 400 --visits 150 --out artifacts/cross_match/samenet_distilled_v150.json
run_stage color_asym 7200 python tools/color_asymmetry_selfmatch.py --platform cpu --games 400 --visits 150
run_stage cross_v600 21600 python tools/cross_match.py --mode samenet --platform cpu \
  --model /root/repo/.runs/refnet_distill/coffee-b6c96-distilled.bin.gz \
  --games 200 --visits 600 --out artifacts/cross_match/samenet_distilled_v600.json
echo "=== cpu queue complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
