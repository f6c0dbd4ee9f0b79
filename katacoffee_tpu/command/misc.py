"""Misc commands: demoplay and samplesgfs/dataminesgfs.

The role of the reference's `cpp/command/misc.cpp` subcommands
(main.cpp dispatch): `demoplay` — watch the engine play itself with board
printouts; `samplesgfs` — sample positions out of SGF collections into a
startposes dir (the simple half of dataminesgfs; the search-filtered
"hintposes" mining is a round-2 item, SURVEY.md misc.cpp:577,1184)."""

from __future__ import annotations

import os
import random


def main_demoplay(argv, **kw):
    import argparse

    from katacoffee_tpu.game import io as gio
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.program.engine import Engine
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn

    ap = argparse.ArgumentParser(prog="katacoffee demoplay")
    ap.add_argument("-model", default=None)
    ap.add_argument("-visits", type=int, default=100)
    ap.add_argument("-games", type=int, default=1)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    eval_fn = None
    if args.model:
        from katacoffee_tpu.dataio.checkpoints import load_exported_model

        model, params, cfg, meta = load_exported_model(args.model)
        eval_fn = make_nn_eval_fn(cfg, model, params)
        print(f"model: {meta['name']}")
    sp = SearchParams.for_tests_v2()

    for g in range(args.games):
        eng = Engine(cfg, sp, eval_fn, seed=args.seed + g)
        print(f"=== game {g + 1} ===")
        while not eng.game_over:
            mover = "black" if eng.to_move == 1 else "white"
            action, result = eng.genmove(args.visits)
            print(
                f"{mover}: {gio.action_to_string(action, cfg)} "
                f"(wr {result.root_winrate:.3f}, visits {result.root_visits})"
            )
            print(eng.showboard())
        res = {0: "draw", 1: "black wins", 2: "white wins"}[eng.winner]
        print(f"result: {res} after {len(eng.move_history)} moves")


def main_samplesgfs(argv, **kw):
    import argparse

    from katacoffee_tpu.dataio.sgf import parse_sgf_file, write_sgf
    from katacoffee_tpu.game.board import GameConfig

    ap = argparse.ArgumentParser(prog="katacoffee samplesgfs")
    ap.add_argument("sgf_dirs", nargs="+")
    ap.add_argument("-out-dir", required=True)
    ap.add_argument("-sample-prob", type=float, default=0.1,
                    help="probability of keeping each position")
    ap.add_argument("-min-turn", type=int, default=2)
    ap.add_argument("-max-turn", type=int, default=18)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    rnd = random.Random(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    kept = scanned = 0
    for d in args.sgf_dirs:
        for root, _dirs, files in os.walk(d):
            for name in sorted(files):
                if not name.endswith(".sgf"):
                    continue
                try:
                    sgf = parse_sgf_file(os.path.join(root, name))
                except (ValueError, OSError):
                    continue
                scanned += 1
                x, y = sgf.board_size()
                moves = sgf.moves()
                for t in range(args.min_turn, min(len(moves), args.max_turn)):
                    if rnd.random() >= args.sample_prob:
                        continue
                    # prefix game as a startpos SGF (load_startposes replays it)
                    text = write_sgf(
                        x, y, sgf.win_len(), moves[:t], "sampled", "sampled"
                    )
                    out = os.path.join(args.out_dir, f"pos{kept:06d}.sgf")
                    with open(out, "w") as f:
                        f.write(text + "\n")
                    kept += 1
    print(f"sampled {kept} positions from {scanned} SGFs into {args.out_dir}")
