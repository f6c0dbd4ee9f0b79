"""Book commands: genbook / writebook / checkbook / booktoposes.

The CLI role of the reference's `cpp/command/genbook.cpp` (genbook,
writebook, checkbook, booktoposes subcommands, main.cpp dispatch)."""

from __future__ import annotations

import os


def main_genbook(argv, **kw):
    import argparse

    import jax

    from katacoffee_tpu.book import Book, build_book
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn, uniform_eval_fn

    ap = argparse.ArgumentParser(prog="katacoffee genbook")
    ap.add_argument("-out", required=True, help="book JSON path")
    ap.add_argument("-model", default=None)
    ap.add_argument("-rounds", type=int, default=10)
    ap.add_argument("-batch-size", type=int, default=64)
    ap.add_argument("-visits", type=int, default=300)
    ap.add_argument("-resume", action="store_true")
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    if args.model:
        from katacoffee_tpu.dataio.checkpoints import load_exported_model

        model, params, cfg, meta = load_exported_model(args.model)
        eval_fn = make_nn_eval_fn(cfg, model, params)
    else:
        eval_fn = uniform_eval_fn(cfg)

    if args.resume and os.path.exists(args.out):
        book = Book.load(args.out)
        key = jax.random.PRNGKey(args.seed + 1)
        for r in range(args.rounds):
            frontier = book.frontier(args.batch_size)
            if not frontier:
                break
            key, k = jax.random.split(key)
            sp = SearchParams.for_tests_v2()
            book.expand(frontier, sp, eval_fn, args.visits, k)
            print(f"book: round {r}: +{len(frontier)} -> {len(book.nodes)} nodes")
        book.recompute()
    else:
        book = build_book(
            cfg,
            SearchParams.for_tests_v2(),
            eval_fn,
            num_rounds=args.rounds,
            batch_size=args.batch_size,
            num_visits=args.visits,
            seed=args.seed,
        )
    book.save(args.out)
    print(f"saved {len(book.nodes)} nodes to {args.out}")


def main_writebook(argv, **kw):
    import argparse

    from katacoffee_tpu.book import Book

    ap = argparse.ArgumentParser(prog="katacoffee writebook")
    ap.add_argument("book")
    ap.add_argument("-out-dir", required=True)
    ap.add_argument("-max-nodes", type=int, default=2000)
    args = ap.parse_args(argv)
    book = Book.load(args.book)
    book.export_html(args.out_dir, max_nodes=args.max_nodes)
    print(f"wrote HTML for up to {args.max_nodes} of {len(book.nodes)} nodes to {args.out_dir}")


def main_checkbook(argv, **kw):
    import argparse

    from katacoffee_tpu.book import Book

    ap = argparse.ArgumentParser(prog="katacoffee checkbook")
    ap.add_argument("book")
    args = ap.parse_args(argv)
    book = Book.load(args.book)
    errors = book.check()
    for e in errors:
        print("ERROR:", e)
    print(f"{len(book.nodes)} nodes, {sum(len(n.edges) for n in book.nodes.values())} edges, "
          f"{len(errors)} errors")
    return 1 if errors else 0


def main_booktoposes(argv, **kw):
    """Dump book positions as SGF start positions (booktoposes)."""
    import argparse

    from katacoffee_tpu.book import Book
    from katacoffee_tpu.dataio.sgf import write_sgf

    ap = argparse.ArgumentParser(prog="katacoffee booktoposes")
    ap.add_argument("book")
    ap.add_argument("-out-dir", required=True)
    ap.add_argument("-min-turns", type=int, default=1)
    args = ap.parse_args(argv)
    book = Book.load(args.book)
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for key, node in book.nodes.items():
        if node.num_turns < args.min_turns:
            continue
        placements = [
            (x, y, node.board[y][x])
            for y in range(book.cfg.y_size)
            for x in range(book.cfg.x_size)
            if node.board[y][x] != 0
        ]
        text = write_sgf(
            book.cfg.x_size, book.cfg.y_size, book.cfg.win_len, [],
            "book", "book", placements=placements,
            root_comment=f"bookNode={key},toMove={node.to_move},"
                         f"lastSpot={node.last_spot},lastDir={node.last_dir}",
        )
        with open(os.path.join(args.out_dir, f"{key}.sgf"), "w") as f:
            f.write(text + "\n")
        n += 1
    print(f"wrote {n} start positions to {args.out_dir}")
