"""Binary-level rules differential: replay SGFs produced by the REPAIRED
reference engine (refbuild/cpp/katago, see BASELINE.md "Measured baseline")
through this framework's rules implementations and verify they agree
move-by-move.

For every SGF game this checks, per move:
  * the move is legal under BOTH our scalar oracle (tests/oracle.py) and the
    vectorized JAX engine (katacoffee_tpu.game) — i.e. the reference never
    plays a move we would reject;
  * the full legal-move masks of oracle and JAX engine agree (so we would
    also OFFER exactly the same moves);
  * game termination timing and the winner agree with the SGF's RE result
    (reference BoardHistory::checkGameEnd semantics, boardhistory.cpp:157-176).

Two modes:
  generate — run the reference selfplay binary briefly to produce SGFs and
             copy a sample into tests/goldens/ref_sgfs/ as durable fixtures
             (fork/side-position/startpos inits disabled so every game starts
             from the empty board; see the cfg written below).
  replay   — replay a directory of SGFs (defaults to the committed fixtures)
             and report/raise on any divergence.  tests/test_rules_differential.py
             runs this mode in CI.

Usage:
  python tools/rules_differential.py generate [minutes] [max_sgfs]
  python tools/rules_differential.py replay [sgf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

KATAGO = os.path.join(REPO, "refbuild", "cpp", "katago")
FIXTURE_DIR = os.path.join(REPO, "tests", "goldens", "ref_sgfs")


def _load_oracle():
    spec = importlib.util.spec_from_file_location(
        "oracle", os.path.join(REPO, "tests", "oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("oracle", mod)  # dataclasses looks the module up
    spec.loader.exec_module(mod)
    return mod


def replay_sgf_text(text: str, oracle_mod) -> dict:
    """Replay one SGF through the oracle + JAX engine. Returns a report dict;
    raises AssertionError on any divergence."""
    import numpy as np

    from katacoffee_tpu.dataio.sgf import parse_sgf, _flatten_main_line
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.game import jitted

    flat = _flatten_main_line(parse_sgf(text))
    xs, ys = flat.board_size()
    win_len = flat.win_len()
    result = flat.result() or ""
    if flat.placements():
        return {"skipped": "setup stones"}

    cfg = GameConfig(xs, ys, win_len)
    area = xs * ys
    game = oracle_mod.OracleGame(xs, ys, win_len)
    state = init_state(cfg)
    step = jitted.step_fn(cfg)
    legal_flat = jitted.legal_mask_flat_fn(cfg)

    moves = flat.moves()
    for i, (x, y, d, color) in enumerate(moves):
        assert not game.done, f"move {i}: reference plays after our game end"
        assert game.to_move == color, f"move {i}: mover mismatch"
        assert game.is_legal(x, y, d), f"move {i}: oracle rejects {(x, y, d)}"
        # full legal-mask agreement (dir-major flat layout, board.py:85-87)
        mask = np.asarray(legal_flat(state))
        oracle_mask = np.zeros(area * 4, dtype=bool)
        for (ox, oy, od) in game.legal_moves():
            oracle_mask[od * area + oy * xs + ox] = True
        assert (mask == oracle_mask).all(), f"move {i}: legal-mask divergence"
        action = d * area + y * xs + x
        game.play(x, y, d)
        state = step(state, np.int32(action))
        assert bool(state.done) == game.done, f"move {i}: done mismatch"
        assert int(state.winner) == game.winner, f"move {i}: winner mismatch"

    # Terminal agreement with the SGF result (reference gameResultNoSgfTag,
    # sgf.cpp:1491-1505 + the repairs patch's draw case): "B+", "W+",
    # "B+R"/"W+R" (resign), "0" (draw), absent (turn-limit/unfinished).
    if result.endswith("R"):
        pass  # resignation: game need not be terminal under the rules
    elif result.startswith("B+"):
        assert game.done and game.winner == oracle_mod.BLACK, f"RE={result}"
    elif result.startswith("W+"):
        assert game.done and game.winner == oracle_mod.WHITE, f"RE={result}"
    elif result == "0":
        assert game.done and game.winner == 0, f"RE={result}"
    else:
        assert not game.done, f"no RE but our game ended (winner {game.winner})"
    return {"moves": len(moves), "result": result, "done": game.done}


def replay_dir(sgf_dir: str) -> dict:
    oracle_mod = _load_oracle()
    files = sorted(
        f for f in os.listdir(sgf_dir) if f.endswith((".sgf", ".sgfs"))
    )
    stats = {"games": 0, "moves": 0, "skipped": 0, "results": {}}
    for fname in files:
        with open(os.path.join(sgf_dir, fname)) as f:
            content = f.read()
        # reference .sgfs files hold one SGF per line
        texts = (
            [l for l in content.splitlines() if l.strip()]
            if fname.endswith(".sgfs")
            else [content]
        )
        for text in texts:
            rep = replay_sgf_text(text, oracle_mod)
            if "skipped" in rep:
                stats["skipped"] += 1
                continue
            stats["games"] += 1
            stats["moves"] += rep["moves"]
            stats["results"][rep["result"]] = stats["results"].get(rep["result"], 0) + 1
    return stats


def generate(minutes: float = 3.0, max_sgfs: int = 60) -> None:
    assert os.path.exists(KATAGO), f"build the reference first: {KATAGO}"
    workdir = tempfile.mkdtemp(prefix="refdiff_")
    models = os.path.join(workdir, "models")
    outdir = os.path.join(workdir, "out")
    os.makedirs(os.path.join(models, "random-b6c96"), exist_ok=True)
    # make_model.py writes models/coffee-b6c96-random.bin.gz under its cwd
    model_gz = os.path.join(REPO, "refbuild", "models", "coffee-b6c96-random.bin.gz")
    if not os.path.exists(model_gz):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "refbuild_patches", "make_model.py")],
            check=True,
            cwd=os.path.join(REPO, "refbuild"),
        )
    import shutil

    shutil.copy(model_gz, os.path.join(models, "random-b6c96", "model.bin.gz"))

    # the baseline selfplay cfg with every non-empty-board game init disabled,
    # so each SGF replays from the empty board (fork semantics are tested
    # separately in tests/test_forking.py)
    base = open(os.path.join(REPO, "refbuild_patches", "selfplay_bench.cfg")).read()
    overrides = {
        "earlyForkGameProb": "0.0",
        "forkGameProb": "0.0",
        "sekiForkHackProb": "0.0",
        "sidePositionProb": "0.0",
        "initGamesWithPolicy": "false",
        "handicapProb": "0.0",
        "maxVisits": "40",
        "cheapSearchProb": "0.0",
        "reduceVisits": "false",
        "numGameThreads": "2",
    }
    lines = []
    seen = set()
    for line in base.splitlines():
        key = line.split("=")[0].strip()
        if key in overrides:
            lines.append(f"{key} = {overrides[key]}")
            seen.add(key)
        else:
            lines.append(line)
    for k, v in overrides.items():
        if k not in seen:
            lines.append(f"{k} = {v}")
    cfg = os.path.join(workdir, "selfplay_diff.cfg")
    with open(cfg, "w") as f:
        f.write("\n".join(lines) + "\n")

    proc = subprocess.Popen(
        [KATAGO, "selfplay", "-config", cfg, "-models-dir", models,
         "-output-dir", outdir, "-max-games-total", str(max_sgfs)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
    )
    deadline = time.time() + minutes * 60
    while proc.poll() is None and time.time() < deadline:
        time.sleep(5)
    if proc.poll() is None:
        proc.terminate()
        proc.wait(timeout=60)

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    n = 0
    for root, _dirs, files in os.walk(outdir):
        for fname in sorted(files):
            if fname.endswith((".sgf", ".sgfs")) and n < max_sgfs:
                shutil.copy(
                    os.path.join(root, fname),
                    os.path.join(FIXTURE_DIR, f"ref_{n:03d}{os.path.splitext(fname)[1]}"),
                )
                n += 1
    print(f"copied {n} SGF files to {FIXTURE_DIR}")
    print(replay_dir(FIXTURE_DIR))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "replay"
    if mode == "generate":
        generate(
            float(sys.argv[2]) if len(sys.argv) > 2 else 3.0,
            int(sys.argv[3]) if len(sys.argv) > 3 else 60,
        )
    else:
        d = sys.argv[2] if len(sys.argv) > 2 else FIXTURE_DIR
        print(replay_dir(d))
