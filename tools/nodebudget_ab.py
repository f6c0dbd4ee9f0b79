#!/usr/bin/env python3
"""Node-budget A/B (follow-up to the round-4 phase split): the descent
gather's one-hot einsum materializes [B,A,N] per fetch AND the layout
duplication of the [B,N,A] children/edge-visit buffers costs ~16% of the
segment wall in re-layout copies (artifacts/bench_phase_split.json;
copy events s32[512,386,100] {0,1,2}<->{2,0,1}) — ALL of it scales with N =
max node slots. The bench runs node_budget_frac 0.64 (N=386 at 600 visits);
this A/Bs smaller budgets.

Semantics at smaller N: capacity overflow is a soft truncation (the playout
revisits the stopping node with catch-up bookkeeping, mcts.py expansion
docs), so a tighter budget trades tail-of-move tree capacity for wall time.
Quality gates reported per budget: same-seed played-move agreement vs the
0.64 baseline across segments, plus visit-weighted policy-target L1 drift
(what actually reaches the training data).

Writes artifacts/nodebudget_ab.json. Run on the real TPU.
CPU smoke: python tools/nodebudget_ab.py --platform cpu --batch 8 --sims 40 --segments 2
"""
import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("KC_JAX_CACHE", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--fracs", default="0.64,0.5,0.4")
    ap.add_argument("--moves-per-segment", type=int, default=2)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "nodebudget_ab.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    B = args.batch
    sp = SearchParams.for_selfplay()
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)

    def bench_one(frac):
        settings = SelfplaySettings(num_sims=args.sims, node_budget_frac=frac)
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        seg = jax.jit(
            lambda s, e, r: run_selfplay_segment(
                cfg, sp, settings, eval_fn, s, e, r, args.moves_per_segment
            )
        )
        s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
        acts = [np.asarray(traj.played_action)]
        pts = [np.asarray(traj.policy_target)]
        float(jnp.sum(traj.played_action))
        t0 = time.perf_counter()
        for i in range(args.segments):
            s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
            acts.append(np.asarray(traj.played_action))
            pts.append(np.asarray(traj.policy_target))
        float(jnp.sum(traj.played_action))
        dt = time.perf_counter() - t0
        vps = B * args.sims * args.moves_per_segment * args.segments / dt
        return vps, np.concatenate(acts, 0), np.concatenate(pts, 0)

    fracs = [float(f) for f in args.fracs.split(",")]
    out = {"batch": B, "sims": args.sims, "board": [cfg.x_size, cfg.y_size, cfg.win_len],
           "budgets": {}}
    base_acts = base_pts = None
    base_vps = None
    for f in fracs:
        n = max(64, int(args.sims * f) + 2)
        print(f"frac={f} (N={n}) ...", file=sys.stderr)
        vps, acts, pts = bench_one(f)
        entry = {"max_nodes": n, "visits_per_sec": round(vps, 1)}
        if base_acts is None:
            base_acts, base_pts, base_vps = acts, pts, vps
        else:
            entry["speedup_vs_first"] = round(vps / base_vps, 4)
            entry["same_seed_move_agreement"] = round(float((acts == base_acts).mean()), 4)
            entry["policy_target_l1_drift"] = round(
                float(np.abs(pts - base_pts).sum(-1).mean()), 5
            )
        out["budgets"][str(f)] = entry
        print(f"  {entry}", file=sys.stderr)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
