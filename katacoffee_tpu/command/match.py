"""Match command: round-robin games between exported models + Elo report.

The role of the reference's `cpp/command/match.cpp` (multi-bot round-robin
with batched NN, match.cpp:29-364) combined with its Elo summarizer
(`python/summarize_sgfs.py` / `python/elo.py`): every pair of bots plays a
batched lockstep match; results feed the MLE Elo fitter.
"""

from __future__ import annotations

import itertools
import os

from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.program.match import match_sgfs, run_match
from katacoffee_tpu.search import SearchParams, make_nn_eval_fn, uniform_eval_fn
from katacoffee_tpu.utils import Logger, compute_elos


def run_round_robin(
    cfg: GameConfig,
    bots: dict[str, object],  # name -> eval_fn
    num_games_per_pair: int,
    num_visits: int,
    sp: SearchParams | None = None,
    seed: int = 0,
    sgf_dir: str | None = None,
    logger: Logger | None = None,
):
    """Returns (records, EloResult): records are (a, b, wins_a, wins_b,
    draws) per pair."""
    logger = logger or Logger(log_to_stdout=True)
    # default to the reference's match op point (match_example.cfg): no root
    # noise, early-move temperature 0.60 → 0.20 so the games in a batched
    # pairing diverge (a zero-temperature profile makes all same-color games
    # of a deterministic bot identical — degenerate records and a garbage
    # Elo fit)
    sp = sp or SearchParams.for_match()
    records = []
    names = sorted(bots)
    for i, (a, b) in enumerate(itertools.combinations(names, 2)):
        result = run_match(
            cfg, sp, sp, bots[a], bots[b],
            num_games=num_games_per_pair, num_visits=num_visits,
            seed=seed + i, record_moves=sgf_dir is not None,
        )
        records.append((a, b, result.wins_a, result.wins_b, result.draws))
        logger.write(
            f"match: {a} vs {b}: {result.wins_a}-{result.wins_b}-{result.draws}"
        )
        if sgf_dir is not None:
            pair_dir = os.path.join(sgf_dir, f"{a}_vs_{b}")
            os.makedirs(pair_dir, exist_ok=True)
            for g, text in enumerate(match_sgfs(cfg, result, a, b)):
                with open(os.path.join(pair_dir, f"game{g:04d}.sgf"), "w") as f:
                    f.write(text + "\n")
    elos = compute_elos(records)
    for name, (e, s) in sorted(elos.as_dict().items(), key=lambda kv: -kv[1][0]):
        logger.write(f"elo: {name:30s} {e:+8.1f} ± {s:.1f}")
    return records, elos


def main(argv, **kw):
    import argparse

    from katacoffee_tpu.dataio.checkpoints import load_exported_model

    ap = argparse.ArgumentParser(prog="katacoffee match")
    ap.add_argument("models", nargs="+", help="exported model dirs; 'random' = uniform priors")
    ap.add_argument("-games-per-pair", type=int, default=50)
    ap.add_argument("-visits", type=int, default=150)
    ap.add_argument("-sgf-dir", default=None)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    bots = {}
    for m in args.models:
        if m == "random":
            bots["random"] = None  # resolved after cfg known
        else:
            model, params, cfg, meta = load_exported_model(m)
            bots[meta["name"]] = make_nn_eval_fn(cfg, model, params)
    if "random" in bots:
        bots["random"] = uniform_eval_fn(cfg)
    run_round_robin(
        cfg, bots, args.games_per_pair, args.visits, seed=args.seed, sgf_dir=args.sgf_dir
    )
