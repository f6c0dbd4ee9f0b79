"""Headline benchmark: selfplay throughput on the real TPU chip.

Runs the full selfplay hot path — batched KataGo-style MCTS at the
reference's training operating point (600 visits/move, graph search, subtree
value bias, noise pruning, uncertainty weighting, tree reuse between moves —
cpp/configs/training/selfplay1.cfg) with the b6c96 flagship net evaluated
in-graph — and reports DELIVERED search visits per second: every move yields
a 600-visit root, the quantity `katago benchmark` calls visits/s
(cpp/command/benchmark.cpp:894-896); tree reuse makes delivered visits
cheaper than playouts exactly as it does in the reference.

`vs_baseline` divides by the MEASURED reference baseline: 992.2 visits/s
from the repaired reference's own `katago benchmark` (Eigen backend, best
thread count, 600 visits, b6c96, this host — BASELINE.md "Measured
baseline", repairs in refbuild_patches/reference_repairs.patch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REFERENCE_VISITS_PER_SEC_MEASURED = 992.2  # BASELINE.json "measured"


def main():
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_selfplay()
    num_sims = 600
    # B=512 won the real-chip batch sweep (tools/batch_sweep.py, STATUS.md:
    # 256→61.6k, 512→63.9k, 1024→43.9k visits/s); short segments keep each
    # device call ~10s, well under the ~20-25s tunnel watchdog. State carries
    # across segments, so tree reuse still engages mid-game. Node budget
    # follows SelfplaySettings' quality-gated default (0.3×visits since
    # round 4 — artifacts/nodebudget_quality.json: nets trained on
    # 0.3/0.4/0.64-budget data are statistically identical in a 900-game
    # three-way round-robin).
    B = 512
    moves_per_segment = 2

    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=num_sims)

    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)

    seg = jax.jit(
        lambda s, e, r: run_selfplay_segment(
            cfg, sp, settings, eval_fn, s, e, r, moves_per_segment
        )
    )

    # warmup/compile (forced host fetch — block_until_ready alone has been
    # observed to return early through wedged tunneled runtimes; a value
    # transfer either really waits or visibly hangs, never lies)
    s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
    float(jnp.sum(traj.played_action))

    segments_timed = 8
    t0 = time.perf_counter()
    for i in range(segments_timed):
        s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
    float(jnp.sum(traj.played_action))
    dt = time.perf_counter() - t0

    moves = moves_per_segment * segments_timed
    visits_per_sec = B * num_sims * moves / dt

    # ---- perf-accounting sidecar (NNEvaluator-stats role, nneval.h:171-176)
    # written to a file so stdout stays exactly one JSON line; failures here
    # must never cost the headline number
    import sys

    try:
        sidecar = _sidecar(
            cfg, sp, num_sims, B, eval_fn, seg, states, ep,
            seg_wall_s=dt / segments_timed,
            seg_visits=B * num_sims * moves_per_segment,
            visits_per_sec=visits_per_sec,
        )
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "bench_sidecar.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(sidecar, f, indent=2)
        print(f"sidecar written to {out}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"sidecar failed: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "selfplay_delivered_visits_per_sec_b6c96_600visits",
                "value": round(visits_per_sec, 1),
                "unit": "visits/s",
                "vs_baseline": round(visits_per_sec / REFERENCE_VISITS_PER_SEC_MEASURED, 3),
            }
        )
    )


def _sidecar(cfg, sp, num_sims, B, eval_fn, seg, states, ep,
             seg_wall_s, seg_visits, visits_per_sec):
    """Perf-accounting breakdown (VERDICT r3 weak-1): search-round counters
    (NN rows submitted vs visits delivered, lockstep batch occupancy), XLA
    cost-model FLOPs/bytes for the compiled segment and the bare NN forward,
    and the derived MFU / HBM-utilization estimates. The trace-based
    per-phase split lives in tools/bench_breakdown.py (traces through the
    tunnel only support RELATIVE splits; CLAUDE.md timing-trust note)."""
    import time as _time

    from katacoffee_tpu.game import init_state
    from katacoffee_tpu.utils import perfcount

    # counters at the operating point (tree reuse engaged after move 1)
    counters = perfcount.search_counters(
        cfg, sp, eval_fn, init_state, batch_size=B, num_sims=num_sims, moves=8,
    )

    # XLA cost model: AOT-compile the same segment signature (persistent
    # compile cache makes this cheap) + the bare NN forward at batch B
    lowered = seg.lower(states, ep, jax.random.PRNGKey(0))
    seg_compiled = lowered.compile()
    nn = jax.jit(eval_fn)
    sb = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    nn_lowered = nn.lower(sb, jax.random.PRNGKey(0))
    nn_compiled = nn_lowered.compile()
    # forced-fetch wall for one bare forward (amortized over a chain)
    r = nn_compiled(sb, jax.random.PRNGKey(0))
    float(jnp.sum(r.policy))
    t0 = _time.perf_counter()
    reps = 20
    for i in range(reps):
        r = nn_compiled(sb, jax.random.PRNGKey(i))
    float(jnp.sum(r.policy))
    nn_wall = (_time.perf_counter() - t0) / reps

    acct = perfcount.flops_accounting(
        seg_compiled, nn_compiled, nn_rows=B,
        seg_wall_s=seg_wall_s, seg_visits=seg_visits,
    )
    acct["nn_forward_wall_s_batch"] = round(nn_wall, 6)
    acct["nn_rows_per_sec_bare_forward"] = round(B / nn_wall, 1)
    nn_rows_per_sec = counters.get("nn_rows_per_sec", 0.0)
    if nn_rows_per_sec:
        # share of wall the searches would spend in NN forwards if each
        # round's forward ran at the bare-forward rate (dispatch overlap can
        # make the true share lower; this is the upper bound)
        acct["nn_time_share_upper_bound"] = round(
            nn_wall * nn_rows_per_sec / B, 4
        )
    return {
        "headline_visits_per_sec": round(visits_per_sec, 1),
        "counters": counters,
        "flops": acct,
    }


if __name__ == "__main__":
    main()
