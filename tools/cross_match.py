#!/usr/bin/env python3
"""Cross-engine strength match: this framework's engine vs the repaired
reference binary (refbuild/cpp/katago, Eigen backend) playing full games
under IDENTICAL search settings at equal visits.

Both sides read the SAME config keys (reference names; our
program.setup.load_search_params consumes the identical text the bridge
passes to Setup::loadParams(SETUP_FOR_MATCH)), so the only differences are
the engine implementations themselves. Two modes:

  uniform: both engines search under the same knowledge-free prior
      distribution — the reference runs its randomized debugSkipNeuralNet
      (-model /dev/null, nneval.cpp:442-500), ours runs the exact mirror
      gaussian_prior_eval_fn (mcts.py).
  samenet: both engines run the SAME b6c96 net — the reference loads the
      .bin.gz through its Eigen backend, ours loads the identical file
      through nn/refmodel.py (forward parity proven in
      tests/test_refmodel.py), nnRandomize off / identity symmetry both
      sides so the net is the same pure function for both.

Games alternate colors; per-game seeds vary both engines' move-temperature
sampling (and the reference's gaussian priors). Every move is cross-checked
against the other engine's rules (play is validated on both boards; final
winner must agree) — a continuous rules differential for free.

Reference machinery mirrored: cpp/command/gatekeeper.cpp:451-545 (gameLoop/
tally at 150 visits), cpp/command/match.cpp:29-364; the search op point is
gatekeeper1.cfg's + Setup SETUP_FOR_MATCH defaults, every contested key
written explicitly into the shared config.

Usage:
  python tools/cross_match.py --mode uniform --games 400 --visits 150 \
      --out artifacts/cross_match_uniform_v150.json
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KATAGO = os.path.join(REPO, "refbuild", "cpp", "katago")
MODEL = os.path.join(REPO, "refbuild", "models", "coffee-b6c96-random.bin.gz")

# The shared op point: gatekeeper1.cfg search keys + the Setup
# SETUP_FOR_MATCH mode defaults written out explicitly so NEITHER side falls
# back to a mode default the other lacks (setup.cpp:470,489,512,525,544,651;
# policyOptimism pinned 0 because the v9 model format has no optimistic head
# — the reference ignores the knob entirely for 4-channel policies, so 0/0
# is exact parity rather than a silent no-op on one side only).
MATCH_CFG = """\
maxVisits = {visits}
numSearchThreads = 1
cpuctExploration = 1.1
cpuctExplorationLog = 0.0
fpuReductionMax = 0.2
rootFpuReductionMax = 0.1
fpuParentWeightByVisitedPolicy = true
fpuParentWeightByVisitedPolicyPow = 2.0
valueWeightExponent = 0.5
useGraphSearch = true
subtreeValueBiasFactor = 0.35
subtreeValueBiasWeightExponent = 0.8
useUncertainty = true
uncertaintyCoeff = 0.25
uncertaintyExponent = 1.0
cpuctUtilityStdevScale = 0.85
cpuctUtilityStdevPrior = 0.40
cpuctUtilityStdevPriorWeight = 2.0
useNoisePruning = true
policyOptimism = 0.0
rootPolicyOptimism = 0.0
rootNoiseEnabled = false
rootDesiredPerChildVisitsCoeff = 0.0
useLcbForSelection = true
lcbStdevs = 5.0
minVisitPropForLCB = 0.15
chosenMoveTemperature = 0.2
chosenMoveTemperatureEarly = 0.5
chosenMoveTemperatureHalflife = 19.0
"""

BRIDGE_EXTRA = """\
logDir = {logdir}
nnRandomize = false
defaultSymmetry = 0
nnCacheSizePowerOfTwo = 18
nnMutexPoolSizePowerOfTwo = 14
lagBuffer = 1.0
boardXSize = {x}
boardYSize = {y}
winLen = {winlen}
"""


class Bridge:
    def __init__(self, cfg_path, model_path):
        self.proc = subprocess.Popen(
            [KATAGO, "coffeebridge", "-config", cfg_path, "-model", model_path],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=open("/tmp/bridge_stderr.log","w"),
            text=True,
            bufsize=1,
        )

    def cmd(self, line: str) -> str:
        if os.environ.get("BRIDGE_CMDLOG"):
            with open(os.environ["BRIDGE_CMDLOG"], "a") as _f:
                _f.write(line + "\n")
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        out = self.proc.stdout.readline().strip()
        if not out:
            raise RuntimeError(f"bridge died on: {line}")
        return out

    def close(self):
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
        except Exception:
            pass
        self.proc.wait(timeout=30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["uniform", "samenet"], required=True)
    ap.add_argument("--games", type=int, default=400)
    ap.add_argument("--visits", type=int, default=150)
    ap.add_argument("--x", type=int, default=5)
    ap.add_argument("--y", type=int, default=5)
    ap.add_argument("--winlen", type=int, default=4)
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    ap.add_argument(
        "--model", default=None,
        help="samenet: .bin.gz both engines load (default: the random-weights "
        "b6c96; pass the distilled net for the trained-net strength match)",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.program.engine import Engine
    from katacoffee_tpu.program.setup import load_search_params
    from katacoffee_tpu.search import mcts
    from katacoffee_tpu.search.params import SearchParams
    from katacoffee_tpu.utils import ConfigParser
    from katacoffee_tpu.utils.elo import compute_elos

    cfg_text = MATCH_CFG.format(visits=args.visits)
    gcfg = GameConfig(args.x, args.y, args.winlen)

    # our side: same keys over searchparams.h defaults
    sp = load_search_params(ConfigParser(text=cfg_text), SearchParams())

    if args.mode == "uniform":
        eval_fn = mcts.gaussian_prior_eval_fn(gcfg)
        model_path = "/dev/null"
    else:
        from katacoffee_tpu.nn.refmodel import load_ref_model, make_ref_eval_fn

        model_path = args.model or MODEL
        model = load_ref_model(model_path)
        eval_fn = make_ref_eval_fn(gcfg, model)

    logdir = f"/tmp/cross_match_logs_{args.mode}"
    os.makedirs(logdir, exist_ok=True)
    bridge_cfg = f"/tmp/cross_match_{args.mode}.cfg"
    with open(bridge_cfg, "w") as f:
        f.write(cfg_text)
        f.write(BRIDGE_EXTRA.format(logdir=logdir, x=args.x, y=args.y, winlen=args.winlen))

    bridge = Bridge(bridge_cfg, model_path)
    eng = Engine(gcfg, sp, eval_fn, seed=args.seed)

    area = gcfg.x_size * gcfg.y_size
    results = []  # per game: +1 us, -1 ref, 0 draw
    t_us = t_ref = 0.0
    total_moves = 0
    t_start = time.time()

    for g in range(args.games):
        ours_black = g % 2 == 0
        eng.clear_board()
        eng._rng = jax.random.PRNGKey(args.seed * 1000003 + g)
        bridge.cmd(f"newgame {args.x} {args.y} {args.winlen} m{args.seed}g{g}")
        winner = None  # 1 black, 2 white, 0 draw
        moves = 0
        while True:
            our_turn = (moves % 2 == 0) == ours_black
            if our_turn:
                t0 = time.time()
                action, _ = eng.genmove(args.visits, play=True)
                t_us += time.time() - t0
                d, spot = action // area, action % area
                mx, my = spot % gcfg.x_size, spot // gcfg.x_size
                resp = bridge.cmd(f"play {mx} {my} {d}")
                if resp.startswith("?"):
                    raise RuntimeError(
                        f"game {g}: reference rejects our move {mx},{my},{d}: {resp}"
                    )
                _, status, w = resp.split()
            else:
                t0 = time.time()
                resp = bridge.cmd("genmove")
                t_ref += time.time() - t0
                parts = resp.split()
                mx, my, d, status, w = (
                    int(parts[1]),
                    int(parts[2]),
                    int(parts[3]),
                    parts[4],
                    parts[5],
                )
                eng.play(mx, my, d)  # raises IllegalMoveError on rules split
            moves += 1
            our_done = eng.game_over
            ref_done = status == "end"
            if our_done != ref_done:
                raise RuntimeError(
                    f"game {g}: game-over disagreement after {moves} moves "
                    f"(ours={our_done} ref={ref_done})"
                )
            if ref_done:
                ref_w = int(w)
                # winner codes agree by construction: 0 draw, 1 black,
                # 2 white (board.py GameState.winner ↔ fork Player)
                our_w = int(np.asarray(eng.state.winner))
                if our_w != ref_w:
                    raise RuntimeError(
                        f"game {g}: winner disagreement ours={our_w} ref={ref_w}"
                    )
                winner = ref_w
                break
            if moves > 4 * area:
                raise RuntimeError(f"game {g}: runaway game")
        total_moves += moves
        if winner == 0:
            results.append(0)
        elif (winner == 1) == ours_black:
            results.append(1)
        else:
            results.append(-1)
        if (g + 1) % 20 == 0 or g == args.games - 1:
            w = sum(1 for r in results if r == 1)
            l = sum(1 for r in results if r == -1)
            dr = sum(1 for r in results if r == 0)
            el = time.time() - t_start
            print(
                f"[{g+1}/{args.games}] us {w} ref {l} draws {dr} "
                f"({el:.0f}s, us {t_us:.0f}s ref {t_ref:.0f}s)",
                flush=True,
            )

    bridge.close()

    wins = sum(1 for r in results if r == 1)
    losses = sum(1 for r in results if r == -1)
    draws = sum(1 for r in results if r == 0)
    elo = compute_elos([("ours", "reference", wins, losses, draws)])
    i_us = elo.players.index("ours")
    i_ref = elo.players.index("reference")
    diff = elo.elos[i_us] - elo.elos[i_ref]
    stdev = float((elo.stdevs[i_us] ** 2 + elo.stdevs[i_ref] ** 2) ** 0.5)

    # split by color for sanity
    wb = sum(1 for g, r in enumerate(results) if r == 1 and g % 2 == 0)
    ww = wins - wb

    out = {
        "mode": args.mode,
        "games": args.games,
        "visits": args.visits,
        "board": [args.x, args.y, args.winlen],
        "wins": wins,
        "losses": losses,
        "draws": draws,
        "score": (wins + 0.5 * draws) / args.games,
        "elo_diff": float(diff),
        "elo_stdev": stdev,
        "wins_as_black": wb,
        "wins_as_white": ww,
        "avg_moves": total_moves / args.games,
        "time_ours_s": t_us,
        "time_ref_s": t_ref,
        "config": cfg_text,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "config"}, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
