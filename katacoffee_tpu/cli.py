"""Subcommand dispatch — the role of the reference's `cpp/main.cpp`
(dispatch table main.cpp:69-169). Run as `python -m katacoffee_tpu <cmd>`.
"""

from __future__ import annotations

import sys

from katacoffee_tpu import __version__

_HELP = f"""KataCoffee-TPU v{__version__} — TPU-native engine for the game Coffee.

Usage: python -m katacoffee_tpu <subcommand> [args]

Core engines:
  gtp          GTP protocol engine (play via GUI / server)
  analysis     JSON-lines batched analysis engine
  benchmark    visits/s sweep over game-batch sizes
  evalsgf      analyze one SGF position
  genconfig    generate a GTP config (optionally benchmark-tuned)
  demoplay     watch the engine play itself
  samplesgfs   sample SGF positions into a startposes dir
  dataminesgfs mine surprising positions from SGFs via batched search
  viewstartposes   print start-position pools (boards, weights, hints)
  trystartposes    search each start position and print the chosen move
  sampleinitializations  sample policy-initialized openings

Training pipeline (shared -base-dir layout):
  selfplay     training-data generation daemon
  shuffle      window + shuffle npz data for training
  train        trainer daemon (checkpoints, metrics, model export)
  gatekeeper   candidate-vs-champion gating daemon
  validate     evaluate an exported model on npz rows (loss metrics)
  checkpoint   dump / edit / export-for-release a trainer checkpoint
  loop         full synchronous selfplay->shuffle->train->gate loop
  match        round-robin matches between exported models
  summarize_sgfs  tally SGF results and fit MLE Elos
  serve        run the contribution HTTP bus (task/model/data server)
  contribute   volunteer selfplay against a training server

Opening book:
  genbook      expand an opening book with batched search
  writebook    export a book as static HTML
  checkbook    consistency-check a book file
  booktoposes  dump book positions as SGF start positions

Other:
  version      print version
  runtests     run the pytest suite
  printclockinfo  print the monotonic-clock resolution (timing sanity)
"""


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_HELP)
        return 0
    cmd, args = argv[0], argv[1:]

    if cmd == "version":
        print(__version__)
        return 0
    if cmd == "printclockinfo":
        # misc.cpp:564-575 role: sanity-print the engine's timing clock
        import time

        info = time.get_clock_info("monotonic")
        print(f"Clock: time.monotonic ({info.implementation})")
        print(f"Resolution in seconds: {info.resolution}")
        print(f"Ticks since epoch: {time.monotonic_ns()}")
        return 0
    if cmd == "gtp":
        from katacoffee_tpu.command.gtp import main as m

        # optional -model plumbing
        eval_fn = None
        if "-model" in args:
            i = args.index("-model")
            model_dir = args[i + 1]
            del args[i : i + 2]
            from katacoffee_tpu.dataio.checkpoints import load_exported_model
            from katacoffee_tpu.search import (
                make_cached_raw_forward_fn,
                make_nn_eval_fn,
            )

            model, params, cfg, meta = load_exported_model(model_dir)
            eval_fn = make_nn_eval_fn(cfg, model, params)
            # NNCacheTable role: repeated kata-raw-nn / ownership queries of
            # the same position skip the device forward (nneval.h:18-42)
            raw_fwd = make_cached_raw_forward_fn(cfg, model, params)
            m(args, cfg=cfg, eval_fn=eval_fn, raw_fwd=raw_fwd)
            return 0
        m(args)
        return 0
    if cmd == "analysis":
        from katacoffee_tpu.command.analysis import main as m

        factory = None
        if "-model" in args:
            i = args.index("-model")
            model_dir = args[i + 1]
            del args[i : i + 2]
            from katacoffee_tpu.dataio.checkpoints import load_exported_model
            from katacoffee_tpu.search import make_nn_eval_fn

            model, params, mcfg, meta = load_exported_model(model_dir)

            def factory(cfg, _m=model, _p=params):
                return make_nn_eval_fn(cfg, _m, _p)

            from katacoffee_tpu.search import make_cached_raw_forward_fn

            def raw_factory(cfg, _m=model, _p=params):
                return make_cached_raw_forward_fn(cfg, _m, _p)

            m(args, eval_fn_factory=factory, raw_forward_factory=raw_factory)
            return 0
        m(args, eval_fn_factory=factory)
        return 0
    if cmd == "selfplay":
        from katacoffee_tpu.command.selfplay import main as m

        m(args)
        return 0
    if cmd == "shuffle":
        import argparse

        from katacoffee_tpu.dataio.shuffle import shuffle_data

        ap = argparse.ArgumentParser(prog="katacoffee shuffle")
        ap.add_argument("data_dirs", nargs="+")
        ap.add_argument("-out-dir", required=True)
        ap.add_argument("-min-rows", type=int, default=250000)
        ap.add_argument("-expand-window-per-row", type=float, default=0.4)
        ap.add_argument("-taper-window-exponent", type=float, default=0.65)
        ap.add_argument("-keep-target-rows", type=int, default=None)
        ap.add_argument("-val-prop", type=float, default=0.0)
        ap.add_argument("-seed", type=int, default=None)
        a = ap.parse_args(args)
        stats = shuffle_data(
            a.data_dirs,
            a.out_dir,
            min_rows=a.min_rows,
            expand_window_per_row=a.expand_window_per_row,
            taper_window_exponent=a.taper_window_exponent,
            keep_target_rows=a.keep_target_rows,
            val_prop=a.val_prop,
            seed=a.seed,
        )
        print(stats)
        return 0
    if cmd == "train":
        from katacoffee_tpu.command.train import main as m

        m(args)
        return 0
    if cmd == "validate":
        from katacoffee_tpu.command.validate import main as m

        return m(args) or 0
    if cmd == "checkpoint":
        from katacoffee_tpu.command.checkpoint import main as m

        return m(args) or 0
    if cmd == "gatekeeper":
        from katacoffee_tpu.command.gatekeeper import main as m

        m(args)
        return 0
    if cmd == "loop":
        from katacoffee_tpu.command.loop import main as m

        m(args)
        return 0
    if cmd == "match":
        from katacoffee_tpu.command.match import main as m

        m(args)
        return 0
    if cmd == "benchmark":
        from katacoffee_tpu.command.benchmark import main as m

        m(args)
        return 0
    if cmd == "evalsgf":
        from katacoffee_tpu.command.evalsgf import main as m

        m(args)
        return 0
    if cmd == "demoplay":
        from katacoffee_tpu.command.misc import main_demoplay as m

        m(args)
        return 0
    if cmd == "samplesgfs":
        from katacoffee_tpu.command.misc import main_samplesgfs as m

        m(args)
        return 0
    if cmd == "dataminesgfs":
        from katacoffee_tpu.command.misc import main_dataminesgfs as m

        m(args)
        return 0
    if cmd == "viewstartposes":
        from katacoffee_tpu.command.misc import main_viewstartposes as m

        m(args)
        return 0
    if cmd == "trystartposes":
        from katacoffee_tpu.command.misc import main_trystartposes as m

        m(args)
        return 0
    if cmd == "sampleinitializations":
        from katacoffee_tpu.command.misc import main_sampleinitializations as m

        m(args)
        return 0
    if cmd == "genconfig":
        from katacoffee_tpu.command.genconfig import main as m

        m(args)
        return 0
    if cmd == "contribute":
        from katacoffee_tpu.distributed.client import main as m

        m(args)
        return 0
    if cmd == "serve":
        from katacoffee_tpu.distributed.client import main_serve as m

        m(args)
        return 0
    if cmd in ("genbook", "writebook", "checkbook", "booktoposes"):
        from katacoffee_tpu.command import genbook as gb

        fn = {
            "genbook": gb.main_genbook,
            "writebook": gb.main_writebook,
            "checkbook": gb.main_checkbook,
            "booktoposes": gb.main_booktoposes,
        }[cmd]
        return fn(args) or 0
    if cmd == "summarize_sgfs":
        from katacoffee_tpu.command.summarize_sgfs import main as m

        m(args)
        return 0
    if cmd == "runtests":
        import subprocess

        return subprocess.call([sys.executable, "-m", "pytest", "tests/", "-q"] + args)

    print(f"unknown subcommand: {cmd}\n")
    print(_HELP)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
