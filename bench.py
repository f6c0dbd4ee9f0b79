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
    # across segments, so tree reuse still engages mid-game.
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


if __name__ == "__main__":
    main()
