#!/usr/bin/env python3
"""Vectorized K-playouts-per-round A/B (round 5): speed at the bench op
point for K in {1,2,4}, plus a strength gate — K=2 vs K=1 head-to-head with
the flagship champion at equal 600-visit budgets.

The vectorized round (mcts._simulate_round) folds K playouts into the batch
dim so a level costs one op set regardless of K; rounds per move divide by
~K. Diversification = sequenced root selection with virtual losses
(selection-time only); below the root, same-node collisions duplicate
instead of virtual-loss-splitting (documented deviation). This tool decides
whether K>1 is adopted: speed must scale AND the match must hold within
noise at equal visits.

Run on the real TPU: python tools/kvec_ab.py [--games 300]
Writes artifacts/kvec_ab.json.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=300)
    ap.add_argument("--visits", type=int, default=600)
    ap.add_argument("--segments", type=int, default=6)
    ap.add_argument("--ks", default="1,2,4")
    ap.add_argument("--skip-match", action="store_true")
    ap.add_argument("--skip-speed", action="store_true",
                    help="strength match only (speed is chip-bound; the "
                    "match semantics are platform-independent)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs("/root/repo/.jax_cache_kvec", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_kvec")
    import jax.numpy as jnp

    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.program.match import run_match
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    champ = os.path.join(REPO, "artifacts", "flagship_b6c96", "models")
    latest = max(os.listdir(champ), key=lambda m: int(m.rsplit("-s", 1)[1]))
    model, params, mcfg, meta = load_exported_model(os.path.join(champ, latest))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=args.visits)
    B = 512
    out = {"champion": latest, "visits": args.visits, "batch": B, "speed": {}}

    for K in ([] if args.skip_speed else [int(k) for k in args.ks.split(",")]):
        sp = dataclasses.replace(SearchParams.for_selfplay(), numSearchThreads=K)
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        seg = jax.jit(
            lambda s, e, r, sp=sp: run_selfplay_segment(
                cfg, sp, settings, eval_fn, s, e, r, 2
            )
        )
        s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
        float(jnp.sum(traj.played_action))  # forced fetch = real compile+run
        t0 = time.perf_counter()
        for i in range(args.segments):
            s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
        float(jnp.sum(traj.played_action))
        dt = time.perf_counter() - t0
        vps = B * args.visits * 2 * args.segments / dt
        out["speed"][f"K{K}"] = round(vps, 1)
        print(f"K={K}: {vps:,.0f} visits/s", flush=True)

    if not args.skip_match:
        sp1 = SearchParams.for_selfplay()
        sp2 = dataclasses.replace(sp1, numSearchThreads=2)
        t0 = time.time()
        res = run_match(
            cfg, sp2, sp1, eval_fn, eval_fn,
            num_games=args.games, num_visits=args.visits, seed=97,
        )
        n = res.wins_a + res.wins_b + res.draws
        score = (res.wins_a + 0.5 * res.draws) / max(n, 1)
        import math

        se = math.sqrt(max(score * (1 - score), 1e-9) / n)
        elo = -400 * math.log10(1 / min(max(score, 1e-6), 1 - 1e-6) - 1)
        # delta-method stderr on the Elo scale
        elo_se = 400 / math.log(10) * se / max(score * (1 - score), 1e-9)
        out["match_k2_vs_k1"] = dict(
            games=n, wins_k2=res.wins_a, wins_k1=res.wins_b, draws=res.draws,
            score_k2=round(score, 4), elo_k2_minus_k1=round(elo, 1),
            elo_stderr=round(elo_se, 1), wall_s=round(time.time() - t0, 1),
        )
        print(out["match_k2_vs_k1"], flush=True)

    path = os.path.join(REPO, "artifacts", "kvec_ab.json")
    if os.path.exists(path):  # merge: speed + match may come from separate runs
        prev = json.load(open(path))
        prev.update({k: v for k, v in out.items() if v not in ({}, None)})
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/kvec_ab.json", flush=True)


if __name__ == "__main__":
    main()
