#!/usr/bin/env python3
"""Self-match color tally (VERDICT r4 weak-5 close-out): play the SAME
engine against itself — both seats ours, no reference bridge anywhere —
with the same shared net and the exact cross-match op point, and tally
wins by COLOR. If the samenet white-favoring skew reproduces here, it is a
property of (5,5,4) play under that net, not a cross-match harness
artifact. See docs/DESIGN.md "Cross-match color asymmetry".

Run (TPU, ONE process at a time; --platform cpu for smoke):
    python tools/color_asymmetry_selfmatch.py [--games 400] [--visits 150]
Writes artifacts/color_asymmetry.json.
"""
import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cross_match import MATCH_CFG, MODEL  # tools/ sibling  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=400)
    ap.add_argument("--visits", type=int, default=150)
    ap.add_argument("--model", default=MODEL)
    ap.add_argument("--uniform", action="store_true", help="gaussian priors instead of the net")
    ap.add_argument("--seed", type=int, default=31337)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "color_asymmetry.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game.board import GameConfig, init_state, step
    from katacoffee_tpu.program.match import _make_move_fn
    from katacoffee_tpu.program.setup import load_search_params
    from katacoffee_tpu.search import mcts
    from katacoffee_tpu.search.params import SearchParams
    from katacoffee_tpu.utils import ConfigParser

    cfg = GameConfig(5, 5, 4)
    sp = load_search_params(
        ConfigParser(text=MATCH_CFG.format(visits=args.visits)), SearchParams()
    )
    if args.uniform:
        eval_fn = mcts.gaussian_prior_eval_fn(cfg)
        net = "uniform"
    else:
        from katacoffee_tpu.nn.refmodel import load_ref_model, make_ref_eval_fn

        eval_fn = make_ref_eval_fn(cfg, load_ref_model(args.model))
        net = os.path.basename(args.model)

    B = args.games
    move = _make_move_fn(cfg, sp, eval_fn, args.visits)
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for ply in range(cfg.area + 2):
        if bool(np.asarray(states.done).all()):
            break
        rng, k = jax.random.split(rng)
        acts = move(states, k)
        acts = jnp.where(states.done, 0, acts)
        states = jax.jit(jax.vmap(functools.partial(step, cfg)))(states, acts)
    w = np.asarray(states.winner)
    out = dict(
        games=B, visits=args.visits, net=net,
        black_wins=int((w == 1).sum()), white_wins=int((w == 2).sum()),
        draws=int((w == 0).sum()), wall_s=round(time.time() - t0, 1),
        note="both seats the same engine+net; no reference bridge involved",
    )
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
