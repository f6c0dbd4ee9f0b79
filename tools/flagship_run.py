"""Flagship strength run (VERDICT round-1 item 2): sustained b6c96 loop at
the reference operating point — 600-visit selfplay, gatekeeper at 200
games / 150 visits — through >= 5 promotions, then a round-robin Elo table
over every promoted net (+ uniform-prior 'random'), i.e. the gated Elo
curve vs cumulative selfplay data for docs/TrainingDemo.md §2.

Run on the real TPU:  python tools/flagship_run.py <base_dir> [max_cycles]
Resumable: re-running with the same base_dir continues from the promoted
models and data already on disk (every stage is stateless+polling, like the
reference loop).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(base_dir: str, max_cycles: int = 24, target_promotions: int = 5):
    from katacoffee_tpu.command.loop import LoopConfig, run_loop
    from katacoffee_tpu.command.match import run_round_robin
    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import make_nn_eval_fn, uniform_eval_fn
    from katacoffee_tpu.utils import Logger

    cfg = GameConfig(5, 5, 4)
    os.makedirs(base_dir, exist_ok=True)
    logger = Logger(log_to_stdout=True)
    logger.add_file(os.path.join(base_dir, "flagship_log.txt"))

    lc = LoopConfig(
        num_cycles=1,  # driven one cycle at a time so we can stop at the target
        rows_per_cycle=24000,
        selfplay_batch=256,
        selfplay_visits=600,          # selfplay1.cfg:84 op point
        train_steps_per_cycle=400,
        train_batch=128,
        model="b6c96",
        gate_games=200,               # gatekeeper1.cfg op point
        gate_visits=150,
        use_gatekeeper=True,
        seed=7,
    )

    def promoted_models():
        d = os.path.join(base_dir, "models")
        if not os.path.isdir(d):
            return []
        return sorted(
            m for m in os.listdir(d)
            if os.path.isfile(os.path.join(d, m, "model.npz"))
        )

    start_promos = len(promoted_models())
    t0 = time.time()
    for cycle in range(max_cycles):
        promos = len(promoted_models()) - start_promos
        logger.write(
            f"flagship: cycle {cycle}, promotions so far {promos} "
            f"(wall {time.time() - t0:.0f}s)"
        )
        if promos >= target_promotions:
            break
        import dataclasses

        run_loop(base_dir, cfg, dataclasses.replace(lc, seed=lc.seed + cycle), logger)

    # ---- Elo table over every promoted net + uniform-prior baseline ----
    models = promoted_models()
    logger.write(f"flagship: final Elo round-robin over {models} + random")
    bots = {"random": uniform_eval_fn(cfg)}
    for m in models:
        model, params, mcfg, meta = load_exported_model(os.path.join(base_dir, "models", m))
        bots[m] = make_nn_eval_fn(cfg, model, params)
    records, elos = run_round_robin(
        cfg, bots, num_games_per_pair=60, num_visits=150,
        seed=123, sgf_dir=os.path.join(base_dir, "elosgfs"), logger=logger,
    )
    table = {k: [round(v[0], 1), round(v[1], 1)] for k, v in elos.as_dict().items()}
    out = {
        "models": models,
        "elos": table,
        "records": records,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(base_dir, "flagship_elos.json"), "w") as f:
        json.dump(out, f, indent=2)
    logger.write("ELOS: " + json.dumps(table))


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/flagship"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    main(base, cycles)
