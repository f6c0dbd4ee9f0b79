#!/usr/bin/env python3
"""Node-budget QUALITY gate (companion to tools/nodebudget_ab.py).

nodebudget_ab measured +13.5% / +21% visits/s at node_budget_frac 0.5 /
0.4 (vs the long-standing 0.64), and /tmp-style probes show the budget is
BINDING: uncapped op-point searches want ~600 nodes/move under tree reuse,
so every budget tested truncates most moves (overflow playouts stop at an
existing node with catch-up bookkeeping — visits still delivered, but a
truncated playout carries less information). Cheaper visits are only a win
if the DATA they produce trains equally strong nets, so the gate is
end-to-end: generate selfplay data under each budget (identical settings
otherwise), train twin nets, play them head-to-head with UNCAPPED
match-profile searches (program/match.py allocates visits+2 slots — the
cross-engine-validated path).

Writes artifacts/nodebudget_quality.json. Run on the real TPU (~45 min).
CPU smoke: python tools/nodebudget_quality.py --platform cpu --rows 600 --steps 30 --games 8 --visits 30 --sp-visits 50 --batch 32
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
    ap.add_argument("--fracs", default="0.64,0.4")
    ap.add_argument("--rows", type=int, default=24000)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--games", type=int, default=200)
    ap.add_argument("--visits", type=int, default=150, help="match visits")
    ap.add_argument("--sp-visits", type=int, default=600)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--base", default="/root/repo/.runs/nodebudget_quality")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "nodebudget_quality.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon
    from katacoffee_tpu.command.train import TrainerConfig, run_training
    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.dataio.shuffle import shuffle_data
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.command.match import run_round_robin
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.train import TrainConfig
    from katacoffee_tpu.utils import Logger

    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_selfplay()
    logger = Logger(log_to_stdout=True)
    t0 = time.time()
    fracs = [float(f) for f in args.fracs.split(",")]

    bots = {}
    for f in fracs:
        tag = f"nb{f}"
        b = os.path.join(args.base, tag)
        max_nodes = max(64, int(args.sp_visits * f) + 2)
        spc = SelfplayConfig(
            batch_size=args.batch, num_sims=args.sp_visits,
            moves_per_segment=16, segments_per_flush=4,
            max_rows=args.rows, seed=41, node_budget_frac=f,
        )
        if not os.path.isdir(os.path.join(b, "selfplay")):
            logger.write(f"=== arm {tag}: selfplay {args.rows} rows, N={max_nodes}")
            run_selfplay_daemon(b, cfg, sp, spc, logger)
        if not os.path.isdir(os.path.join(b, "shuffleddata")):
            shuffle_data(
                [os.path.join(b, "selfplay", "random", "tdata")],
                os.path.join(b, "shuffleddata"), min_rows=10**9, seed=5,
            )
        if not os.path.isdir(os.path.join(b, "modelstobetested")):
            tc = TrainConfig(warmup_steps=20)
            trc = TrainerConfig(
                model="b2c32", batch_size=128, max_steps=args.steps,
                steps_per_export=10**9, checkpoint_every=10**9,
                max_epochs_per_data=10**9, seed=13,
            )
            logger.write(f"=== arm {tag}: train {args.steps} steps")
            run_training(b, cfg, tc, trc, logger)
        d = os.path.join(b, "modelstobetested")
        name = sorted(os.listdir(d))[-1]
        model, params, mcfg, meta = load_exported_model(os.path.join(d, name))
        bots[tag] = make_nn_eval_fn(cfg, model, params)

    records, elo = run_round_robin(
        cfg, bots, args.games, args.visits, seed=71, logger=logger,
    )
    table = {k: [round(v[0], 1), round(v[1], 1)] for k, v in elo.as_dict().items()}
    out = {
        "fracs": fracs, "rows": args.rows, "steps": args.steps,
        "sp_visits": args.sp_visits, "match_visits": args.visits,
        "games": args.games, "records": records, "elos": table,
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
