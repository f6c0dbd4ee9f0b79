#!/usr/bin/env python3
"""maxPlayoutDepthProp validation + A/B (VERDICT r3 weak-2 / next-3b).

Background (CLAUDE.md perf facts): at the selfplay operating point the
lockstep descent runs ~10.4 max-gated LEVELS per simulate round mid-game
(deep single-game lines gate the whole batch), while fresh 600-visit
searches never exceed depth ~8 — so a static depth cap only bites under
TREE REUSE, and capping below 26 measured neutral-to-slower on fresh
searches. The open question this tool answers: does maxPlayoutDepthProp
~0.5 (depth cap 13 at 5x5: max_depth = round(26 * prop)) recover part of
the 56.3k -> 63.9k visits/s gap under reuse segments, and does it stay
quality-neutral?

Three measurements, all with the bench net (b6c96, random init PRNGKey 0):
  perf      — bench-style multi-move reuse segments at prop 1.0 vs 0.5,
              forced-fetch visits/s each;
  agreement — same-seed segment move sequences, % of (game, move) pairs
              where capped and uncapped pick the same action;
  elo       — head-to-head capped vs uncapped at 600 visits with the
              selfplay profile's chosen-move temperature, Elo +/- stdev
              (quality gate: |elo| within ~2 stdev of 0).

Writes artifacts/depthprop_ab.json. Run on the real TPU (ONE TPU process).
CPU smoke: python tools/depthprop_ab.py --platform cpu --batch 16 --sims 50 --games 20
"""
import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("KC_JAX_CACHE", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--prop", type=float, default=0.5)
    ap.add_argument("--moves-per-segment", type=int, default=2)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--games", type=int, default=300, help="elo games")
    ap.add_argument("--skip-elo", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "depthprop_ab.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.program.match import run_match
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    B = args.batch
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=args.sims)

    sp_full = SearchParams.for_selfplay()
    sp_cap = dataclasses.replace(sp_full, maxPlayoutDepthProp=args.prop)
    max_depth_full = cfg.area + 1
    max_depth_cap = max(2, min(max_depth_full, int(round(max_depth_full * args.prop))))

    def bench_one(sp):
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        seg = jax.jit(
            lambda s, e, r: run_selfplay_segment(
                cfg, sp, settings, eval_fn, s, e, r, args.moves_per_segment
            )
        )
        s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
        actions = [np.asarray(traj.played_action)]
        float(jnp.sum(traj.played_action))
        t0 = time.perf_counter()
        for i in range(args.segments):
            s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
            actions.append(np.asarray(traj.played_action))
        float(jnp.sum(traj.played_action))
        dt = time.perf_counter() - t0
        vps = B * args.sims * args.moves_per_segment * args.segments / dt
        return vps, np.concatenate(actions, axis=0)  # [T_total, B]

    print("perf: prop=1.0 ...", file=sys.stderr)
    vps_full, acts_full = bench_one(sp_full)
    print(f"  {vps_full:.1f} visits/s", file=sys.stderr)
    print(f"perf: prop={args.prop} (max_depth {max_depth_full}->{max_depth_cap}) ...",
          file=sys.stderr)
    vps_cap, acts_cap = bench_one(sp_cap)
    print(f"  {vps_cap:.1f} visits/s", file=sys.stderr)

    agree = float((acts_full == acts_cap).mean())

    out = {
        "board": [cfg.x_size, cfg.y_size, cfg.win_len],
        "batch": B, "sims": args.sims,
        "prop": args.prop,
        "max_depth_uncapped": max_depth_full,
        "max_depth_capped": max_depth_cap,
        "visits_per_sec_uncapped": round(vps_full, 1),
        "visits_per_sec_capped": round(vps_cap, 1),
        "speedup": round(vps_cap / vps_full, 4),
        "same_seed_move_agreement": round(agree, 4),
        "moves_compared": int(acts_full.size),
    }

    if not args.skip_elo:
        print(f"elo: capped vs uncapped, {args.games} games ...", file=sys.stderr)
        # chunk games so each device call stays under the tunnel watchdog
        wins = losses = draws = 0
        chunk = max(2, min(100, args.games))
        done = 0
        i = 0
        while done < args.games:
            g = min(chunk, args.games - done)
            r = run_match(
                cfg, sp_cap, sp_full, eval_fn, eval_fn,
                num_games=g, num_visits=args.sims, seed=1000 + i,
            )
            wins += r.wins_a
            losses += r.wins_b
            draws += r.draws
            done += g
            i += 1
            print(f"  [{done}/{args.games}] capped {wins}-{losses}-{draws}",
                  file=sys.stderr)
        n = wins + losses + draws
        score = (wins + 0.5 * draws) / n
        eps = 1e-9
        elo = 400.0 * np.log10((score + eps) / (1 - score + eps))
        # delta-method stdev of the logistic-Elo transform of a binomial score
        stdev_score = float(np.sqrt(max(score * (1 - score), 1e-12) / n))
        elo_stdev = 400.0 / np.log(10) * stdev_score / max(score * (1 - score), 1e-6)
        out["elo"] = {
            "games": n, "capped_wins": wins, "capped_losses": losses,
            "draws": draws, "capped_score": round(score, 4),
            "elo_capped_minus_uncapped": round(float(elo), 1),
            "elo_stdev": round(float(elo_stdev), 1),
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
