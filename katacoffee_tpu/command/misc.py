"""Misc commands: demoplay, samplesgfs, dataminesgfs.

The role of the reference's `cpp/command/misc.cpp` subcommands
(main.cpp dispatch): `demoplay` — watch the engine play itself with board
printouts; `samplesgfs` — sample positions out of SGF collections into a
startposes dir; `dataminesgfs` — search-filtered hint-position mining
(reference misc.cpp:577,1184), implemented below in main_dataminesgfs."""

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


def main_dataminesgfs(argv, **kw):
    """Search-filtered position mining (the reference's dataminesgfs,
    misc.cpp:1184): batch-search sampled SGF positions and keep the
    "interesting" ones — where the search's preferred move disagrees with
    the game's move, or the position is sharply winning/losing — as
    hintpos-style startposes. All candidate positions of a batch are
    evaluated in ONE batched search call."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.dataio.sgf import parse_sgf_file, write_sgf
    from katacoffee_tpu.game.board import GameConfig, init_state, step
    from katacoffee_tpu.search import (
        SearchParams,
        make_nn_eval_fn,
        root_visit_counts,
        root_values,
        run_search,
        uniform_eval_fn,
    )

    ap = argparse.ArgumentParser(prog="katacoffee dataminesgfs")
    ap.add_argument("sgf_dirs", nargs="+")
    ap.add_argument("-out-dir", required=True)
    ap.add_argument("-model", default=None)
    ap.add_argument("-visits", type=int, default=200)
    ap.add_argument("-batch-size", type=int, default=64)
    ap.add_argument("-sample-prob", type=float, default=0.25)
    ap.add_argument("-max-positions", type=int, default=512)
    ap.add_argument("-surprise-threshold", type=float, default=0.5,
                    help="keep if the game move got < this fraction of the search's top-move visits")
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    if args.model:
        from katacoffee_tpu.dataio.checkpoints import load_exported_model

        model, params, cfg, meta = load_exported_model(args.model)
        eval_fn = make_nn_eval_fn(cfg, model, params)
    else:
        eval_fn = uniform_eval_fn(cfg)

    rnd = random.Random(args.seed)
    step1 = jax.jit(lambda s, a: step(cfg, s, a))

    # collect candidate (position, game-move) pairs
    cands = []  # (state, game_action, source)
    for d in args.sgf_dirs:
        for root, _dirs, files in os.walk(d):
            for name in sorted(files):
                if not name.endswith(".sgf") or len(cands) >= args.max_positions:
                    continue
                try:
                    sgf = parse_sgf_file(os.path.join(root, name))
                except (ValueError, OSError):
                    continue
                if sgf.board_size() != (cfg.x_size, cfg.y_size):
                    continue
                s = init_state(cfg)
                for t, (x, y, dd, _pla) in enumerate(sgf.moves()):
                    a = dd * cfg.area + y * cfg.x_size + x
                    if t >= 1 and not bool(s.done) and rnd.random() < args.sample_prob:
                        cands.append((s, a, f"{name}:{t}"))
                    s = step1(s, jnp.asarray(a, jnp.int32))
                    if bool(s.done):
                        break
    if not cands:
        print("no candidate positions found")
        return

    sp = SearchParams.for_tests_v2()
    os.makedirs(args.out_dir, exist_ok=True)
    kept = 0
    Bsz = args.batch_size
    search = jax.jit(lambda r, k: run_search(cfg, sp, eval_fn, r, args.visits, k))
    key = jax.random.PRNGKey(args.seed)
    for lo in range(0, len(cands), Bsz):
        batch = cands[lo : lo + Bsz]
        pad = batch + [batch[-1]] * (Bsz - len(batch))
        roots = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[c[0] for c in pad]
        )
        key, k = jax.random.split(key)
        tree = search(roots, k)
        rv = np.asarray(root_visit_counts(tree))
        wl = np.asarray(root_values(tree)["root_wl"])
        for i, (state, game_a, src) in enumerate(batch):
            top = rv[i].max()
            surprising = rv[i][game_a] < args.surprise_threshold * top
            sharp = abs(wl[i]) > 0.9
            if not (surprising or sharp):
                continue
            board = np.asarray(state.board)
            placements = [
                (x, y, int(board[y, x]))
                for y in range(cfg.y_size)
                for x in range(cfg.x_size)
                if board[y, x] != 0
            ]
            text = write_sgf(
                cfg.x_size, cfg.y_size, cfg.win_len, [], "mined", "mined",
                placements=placements,
                root_comment=(
                    f"src={src},searchBest={int(np.argmax(rv[i]))},"
                    f"gameMove={game_a},rootWL={wl[i]:+.3f},"
                    f"toMove={int(state.to_move)},lastSpot={int(state.last_spot)},"
                    f"lastDir={int(state.last_dir)}"
                ),
            )
            with open(os.path.join(args.out_dir, f"hint{kept:06d}.sgf"), "w") as f:
                f.write(text + "\n")
            kept += 1
    print(f"mined {kept} interesting positions from {len(cands)} candidates into {args.out_dir}")


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


def main_viewstartposes(argv, **kw):
    """View startposes (MainCmds::viewstartposes, misc.cpp:2388): print each
    pool position's board, sampling weight, and hint move."""
    import argparse

    import numpy as np

    from katacoffee_tpu.game import io as gio
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.selfplay.startposes import load_startposes

    ap = argparse.ArgumentParser(prog="katacoffee viewstartposes")
    ap.add_argument("-start-poses-dir", required=True)
    ap.add_argument("-min-weight", type=float, default=0.0)
    ap.add_argument("-idx", type=int, default=-1)
    ap.add_argument("-turn-weight-lambda", type=float, default=0.0)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    out = load_startposes(
        cfg, args.start_poses_dir,
        turn_weight_lambda=args.turn_weight_lambda, with_hints=True,
    )
    if out is None:
        print("no usable startposes")
        return
    pool, probs, hints = out
    boards = np.asarray(pool.board)
    to_move = np.asarray(pool.to_move)
    turns = np.asarray(pool.num_turns)
    idxs = [args.idx] if args.idx >= 0 else range(probs.shape[0])
    shown = 0
    for i in idxs:
        if probs[i] < args.min_weight:
            continue
        hint = (
            gio.action_to_string(int(hints[i]), cfg) if hints[i] >= 0 else "-"
        )
        mover = "black" if to_move[i] == 1 else "white"
        print(
            f"startpos {i}: weight {probs[i]:.5f} turn {turns[i]} "
            f"{mover} to move, hint {hint}"
        )
        print(gio.board_to_string(boards[i], cfg))
        shown += 1
    print(f"{shown} positions")


def main_trystartposes(argv, **kw):
    """Run a batched search on each startpos and print the chosen move and
    values (MainCmds::trystartposes, misc.cpp:2230)."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game import io as gio
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import (
        SearchParams,
        make_nn_eval_fn,
        run_search,
        select_moves,
        uniform_eval_fn,
    )
    from katacoffee_tpu.search.mcts import root_values
    from katacoffee_tpu.selfplay.startposes import load_startposes

    ap = argparse.ArgumentParser(prog="katacoffee trystartposes")
    ap.add_argument("-start-poses-dir", required=True)
    ap.add_argument("-model", default=None)
    ap.add_argument("-visits", type=int, default=100)
    ap.add_argument("-min-weight", type=float, default=0.0)
    ap.add_argument("-max-positions", type=int, default=64)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    if args.model:
        from katacoffee_tpu.dataio.checkpoints import load_exported_model

        model, params, cfg, meta = load_exported_model(args.model)
        eval_fn = make_nn_eval_fn(cfg, model, params)
        print(f"model: {meta['name']}")
    else:
        eval_fn = uniform_eval_fn(cfg)
    out = load_startposes(cfg, args.start_poses_dir, with_hints=True)
    if out is None:
        print("no usable startposes")
        return
    pool, probs, hints = out
    keep = np.where(np.asarray(probs) >= args.min_weight)[0][: args.max_positions]
    roots = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[keep]), pool)

    sp = SearchParams.for_tests_v2()
    tree = jax.jit(
        lambda r, k: run_search(cfg, sp, eval_fn, r, args.visits, k)
    )(roots, jax.random.PRNGKey(0))
    moves = np.asarray(select_moves(cfg, sp, tree, jax.random.PRNGKey(1)))
    vals = root_values(tree)
    wl = np.asarray(vals["root_wl"])
    boards = np.asarray(roots.board)
    for j, i in enumerate(keep):
        hint = gio.action_to_string(int(hints[i]), cfg) if hints[i] >= 0 else "-"
        print(
            f"startpos {i}: move {gio.action_to_string(int(moves[j]), cfg)} "
            f"wl {wl[j]:+.3f} hint {hint}"
        )
        print(gio.board_to_string(boards[j], cfg))
    print(f"tried {len(keep)} positions at {args.visits} visits")


def main_sampleinitializations(argv, **kw):
    """Sample policy-initialized openings and print them
    (MainCmds::sampleinitializations, misc.cpp:2544): the same
    ~Exponential()*area*prop raw-policy opening the selfplay actor uses
    (PlayUtils::initializeGameUsingPolicy, playutils.cpp:147-174)."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game import io as gio
    from katacoffee_tpu.game.board import GameConfig, init_state
    from katacoffee_tpu.game.jitted import vlegal_mask_flat_fn, vstep_fn
    from katacoffee_tpu.search import make_nn_eval_fn, uniform_eval_fn

    ap = argparse.ArgumentParser(prog="katacoffee sampleinitializations")
    ap.add_argument("-model", default=None)
    ap.add_argument("-num", type=int, default=1)
    ap.add_argument("-evaluate", action="store_true")
    ap.add_argument("-area-prop", type=float, default=0.04)
    ap.add_argument("-temperature", type=float, default=1.0)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    if args.model:
        from katacoffee_tpu.dataio.checkpoints import load_exported_model

        model, params, cfg, meta = load_exported_model(args.model)
        eval_fn = make_nn_eval_fn(cfg, model, params)
        print(f"model: {meta['name']}")
    else:
        eval_fn = uniform_eval_fn(cfg)

    B = args.num
    key = jax.random.PRNGKey(args.seed)
    k_len, key = jax.random.split(key)
    lens = np.floor(
        np.asarray(jax.random.exponential(k_len, (B,))) * cfg.area * args.area_prop
    ).astype(int)
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    vstep = vstep_fn(cfg)
    for t in range(int(lens.max()) if B else 0):
        key, k_eval, k_move = jax.random.split(key, 3)
        res = eval_fn(states, k_eval)
        logits = jnp.where(
            res.policy > 0,
            jnp.log(jnp.maximum(res.policy, 1e-30)) / args.temperature,
            -jnp.inf,
        )
        acts = jax.random.categorical(k_move, logits, axis=-1).astype(jnp.int32)
        still = (jnp.asarray(lens) > t) & ~states.done
        acts = jnp.where(still, acts, 0)
        nxt = vstep(states, acts)
        states = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                jnp.reshape(still, (-1,) + (1,) * (n.ndim - 1)), n, o
            ),
            nxt,
            states,
        )
    boards = np.asarray(states.board)
    for i in range(B):
        print(f"initialization {i}: {lens[i]} opening moves")
        print(gio.board_to_string(boards[i], cfg))
        if args.evaluate:
            key, k_eval = jax.random.split(key)
            res = eval_fn(states, k_eval)
            print(f"  raw wl {float(res.wl[i]):+.3f} draw {float(res.draw[i]):.3f}")
