#!/usr/bin/env python3
"""Bench segment-length A/B (round 5): moves-per-device-call 2 vs 4 vs 6 at
the exact bench.py op point (b6c96, 600 visits, B=512, strict selfplay
params, tree reuse).

Motivation: the headline bench is measured through the tunneled chip at
2 moves per device call; the production selfplay daemon already runs longer
per-call segments (command/selfplay.py segments_per_flush), and STATUS.md's
round-5 note measured a ~1.21x tunnel round-trip overhead between the
8-call headline loop and a single-call forced-fetch wall on the same
compiled segment. Longer segments amortize that overhead without touching
search semantics (the compiled move loop is identical; only the host sync
cadence changes). The constraint is the axon watchdog (~20-25s/call).

Run on the real TPU: python tools/seglen_ab.py
Writes artifacts/seglen_ab.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_selfplay()
    num_sims = 600
    B = 512
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=num_sims)

    total_moves = 24  # same total measured work per arm
    out = {"batch": B, "visits": num_sims, "total_moves": total_moves, "arms": {}}
    # arms capped at 4 moves/call (~13s at the round-5 rate): the axon
    # watchdog kills calls beyond ~20-25s, and a watchdog kill mid-queue
    # risks wedging the tunnel for the later stages
    for mps in (2, 3, 4):
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        seg = jax.jit(
            lambda s, e, r, mps=mps: run_selfplay_segment(
                cfg, sp, settings, eval_fn, s, e, r, mps
            )
        )
        s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
        float(jnp.sum(traj.played_action))  # forced fetch
        n_calls = total_moves // mps
        moves_done = n_calls * mps
        t0 = time.perf_counter()
        for i in range(n_calls):
            s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
        float(jnp.sum(traj.played_action))
        dt = time.perf_counter() - t0
        vps = B * num_sims * moves_done / dt
        out["arms"][f"moves{mps}"] = {
            "visits_per_sec": round(vps, 1),
            "sec_per_call": round(dt / n_calls, 2),
            "calls": n_calls,
        }
        print(f"moves/call={mps}: {vps:,.0f} visits/s, {dt/n_calls:.1f}s/call",
              flush=True)

    with open(os.path.join(REPO, "artifacts", "seglen_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/seglen_ab.json", flush=True)


if __name__ == "__main__":
    main()
