#!/usr/bin/env python3
"""Generate reference-NN parity fixtures: random playout positions evaluated
through the repaired reference binary's own NNEvaluator (Eigen backend,
pinned identity symmetry) via the coffeebridge rawnn command.

Output: tests/goldens/refnn/<name>.json with, per position, the move list
and the reference's POSTPROCESSED outputs (policy probs with -1 illegals,
whiteWin/whiteLoss, varTimeLeft, shorttermWinlossError, white ownership).

Run from the repo root with refbuild/ present (refbuild_patches/BUILD.md):
    python tools/gen_refnn_fixtures.py
"""
import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KATAGO = os.path.join(REPO, "refbuild", "cpp", "katago")
MODEL = os.path.join(REPO, "refbuild", "models", "coffee-b6c96-random.bin.gz")
OUTDIR = os.path.join(REPO, "tests", "goldens", "refnn")

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
import oracle  # scalar rules oracle, used only to generate legal move lists


def random_position(rng, x, y, winlen, n_moves):
    g = oracle.OracleGame(x, y, winlen)
    moves = []
    for _ in range(n_moves):
        legal = [
            (mx, my, d)
            for mx in range(x)
            for my in range(y)
            for d in range(4)
            if g.is_legal(mx, my, d)
        ]
        if not legal or g.done:
            break
        mv = rng.choice(legal)
        g.play(*mv)
        if g.done:
            break
        moves.append(mv)
    return moves


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    rng = random.Random(20260820)
    configs = [(5, 5, 4), (7, 7, 5), (9, 6, 5)]
    for (x, y, winlen) in configs:
        cfgpath = "/tmp/rawnn_bridge.cfg"
        with open(cfgpath, "w") as f:
            f.write(
                "logDir = /tmp/bridge_logs\nmaxVisits = 10\nnumSearchThreads = 1\n"
                "nnRandomize = false\ndefaultSymmetry = 0\n"
                "nnCacheSizePowerOfTwo = 16\nnnMutexPoolSizePowerOfTwo = 12\n"
                f"lagBuffer = 1.0\nboardXSize = {x}\nboardYSize = {y}\nwinLen = {winlen}\n"
            )
        lines = []
        fixtures = []
        for i in range(12):
            n = 0 if i == 0 else rng.randint(1, x * y - 2)
            moves = random_position(rng, x, y, winlen, n)
            fixtures.append({"moves": moves})
            lines.append(
                f"rawnn {x} {y} {winlen} "
                + " ".join(f"{mx},{my},{d}" for mx, my, d in moves)
            )
        lines.append("quit")
        proc = subprocess.run(
            [KATAGO, "coffeebridge", "-config", cfgpath, "-model", MODEL],
            input="\n".join(lines) + "\n",
            capture_output=True,
            text=True,
            timeout=1200,
        )
        outs = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
        assert len(outs) == len(fixtures), (proc.stdout[-500:], proc.stderr[-2000:])
        for fx, out in zip(fixtures, outs):
            assert "error" not in out, (fx, out)
            fx.update(out)
        name = f"b6c96_{x}x{y}w{winlen}.json"
        with open(os.path.join(OUTDIR, name), "w") as f:
            json.dump(
                {"x": x, "y": y, "win_len": winlen, "model": "coffee-b6c96-random",
                 "symmetry": 0, "fixtures": fixtures},
                f,
            )
        print(f"wrote {name}: {len(fixtures)} positions")


if __name__ == "__main__":
    main()
