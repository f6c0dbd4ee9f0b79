#!/bin/bash
# Round-5 final-session TPU queue, attempt 2 (after a mid-queue tunnel
# wedge): probe with a REAL small search workload (a bare matmul has been
# observed to pass while the first big program then hangs), fresh cache
# subdir per the recovery protocol, then the combined perf probe and the
# flagship resume. ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%d_%H%M%S)
LOG=/tmp/round5_q2_${STAMP}.log
echo "log: $LOG"
PROBE='
import os, jax
jax.config.update("jax_compilation_cache_dir", os.environ["KC_CACHE_DIR"])
import jax.numpy as jnp
from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet, init_params
from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment
cfg = GameConfig(5, 5, 4)
model = CoffeeNet(get_model_spec("b2c32"), win_len=cfg.win_len)
params = init_params(model, cfg, jax.random.PRNGKey(0))
eval_fn = make_nn_eval_fn(cfg, model, params)
sp = SearchParams.for_selfplay()
st = jax.vmap(lambda _: init_state(cfg))(jnp.arange(16))
ep = jnp.zeros((16,), jnp.int32)
s2, e2, traj = jax.jit(lambda s, e, r: run_selfplay_segment(
    cfg, sp, SelfplaySettings(num_sims=16), eval_fn, s, e, r, 1))(
    st, ep, jax.random.PRNGKey(0))
print("probe ok", float(jnp.sum(traj.played_action)))
'
for i in $(seq 1 20); do
  export KC_CACHE_DIR="/root/repo/.jax_cache_q2_${STAMP}_$i"
  mkdir -p "$KC_CACHE_DIR"
  if timeout 420 python -c "$PROBE" >>"$LOG" 2>&1; then
    echo "real-workload probe ok, attempt $i ($(date -u +%H:%M:%S))" | tee -a "$LOG"
    break
  fi
  echo "probe $i failed ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  [ "$i" = 20 ] && { echo "tunnel never recovered" | tee -a "$LOG"; exit 3; }
  sleep 120
done
export PYTHONUNBUFFERED=1
run_stage() {
  local name="$1"; shift; local cap="$1"; shift
  echo "=== stage $name start ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$cap" "$@" >>"$LOG" 2>&1
  echo "=== stage $name rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  sleep 15
}
run_stage perfprobe 2400 python tools/round5_perf_probe.py
run_stage flagship 3600 python tools/flagship_run.py /root/repo/.runs/flagship_b6c96 12 16
run_stage winlen 2400 python tools/winlen_ablation.py
echo "=== q2 complete ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
