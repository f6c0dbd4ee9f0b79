#!/usr/bin/env python3
"""Win_len-relative-feature ablation (VERDICT r4 task 7, the sharpened
negative): the mixed-size demo's head-to-head tie is explained by the
feature DESIGN — the exact-run threat planes are win_len-relative
(features.py ch15-17, the reference's fillRowWithLine intent,
nninputs.cpp:650-656) and win_len itself is the global input, so a
single-size net transfers across (size, win_len) BY CONSTRUCTION and mixed
training has little to add. This experiment tests that mechanism directly:
train two b2c32 twins on the SAME 5x5w4 rows — standard features vs an
ABLATED net whose apply() zeroes ch15-17 and the win_len global — then
compare on 7x7w5 (transfer target) and 5x5w4 (control).

Prediction: ~equal on 5x5 (within-size, win_len constant, threats learnable
from raw stones), ablated collapses on 7x7 (it never saw win_len=5 and has
no size-invariant threat encoding).

Run on the real TPU (~20-30 min): python tools/winlen_ablation.py
Writes artifacts/winlen_ablation.json.
"""
import dataclasses
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class WinlenAblatedNet:
    """CoffeeNet wrapper whose forward blinds the win_len-relative inputs:
    spatial ch15-17 (exact-length runs of win_len-1..-3) zeroed, global
    win_len channel zeroed. Same params pytree as the inner net."""

    def __init__(self, inner):
        self._inner = inner

    def init(self, rng, spatial, glob):
        return self._inner.init(rng, spatial, glob)

    def apply(self, params, spatial, glob):
        import jax.numpy as jnp

        spatial = spatial.at[:, 15:18].set(0.0)
        glob = jnp.zeros_like(glob)
        return self._inner.apply(params, spatial, glob)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def main(rows=36000, steps=2000, games=200, visits=80, base=None):
    import jax

    if os.environ.get("KC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KC_PLATFORM"])
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.command.match import run_round_robin
    from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon
    from katacoffee_tpu.dataio.shuffle import shuffle_data
    from katacoffee_tpu.dataio.trainingwrite import (
        iter_shards, read_npz_rows, rows_to_batch,
    )
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.train import TrainConfig, compute_losses
    from katacoffee_tpu.train.train import init_train_state, make_train_step
    from katacoffee_tpu.utils import Logger

    t0 = time.time()
    base = base or "/root/repo/.runs/winlen_ablation"
    logger = Logger(log_to_stdout=True)
    cfg5 = GameConfig(5, 5, 4)
    cfg7 = GameConfig(7, 7, 5)
    sp = SearchParams.for_selfplay()
    spc = SelfplayConfig(batch_size=128, num_sims=100, moves_per_segment=16,
                         segments_per_flush=4, seed=3)

    # --- data: 5x5 training rows + held-out rows at both sizes ---
    data5 = os.path.join(base, "data5")
    if not os.path.isdir(os.path.join(data5, "selfplay")):
        run_selfplay_daemon(
            data5, cfg5, sp,
            dataclasses.replace(spc, max_rows=rows, data_tag="5x5w4"), logger,
        )
    if not os.path.isdir(os.path.join(base, "shuffled5")):
        shuffle_data(
            [os.path.join(data5, "selfplay", "random", "tdata_5x5w4")],
            os.path.join(base, "shuffled5"), min_rows=10**9, seed=5,
        )
    for tag, cfg in (("5x5w4", cfg5), ("7x7w5", cfg7)):
        d = os.path.join(base, "heldout", tag)
        if not os.path.isdir(os.path.join(d, "selfplay")):
            run_selfplay_daemon(
                d, cfg, sp,
                dataclasses.replace(spc, max_rows=4000, data_tag=tag, seed=991),
                logger,
            )

    # --- train twins on identical batches ---
    tc = TrainConfig(warmup_steps=20, symmetry_augment=True)
    spec = get_model_spec("b2c32")
    nets = {
        "standard": CoffeeNet(spec, win_len=cfg5.win_len),
        "ablated": WinlenAblatedNet(CoffeeNet(spec, win_len=cfg5.win_len)),
    }
    trained = {}
    from katacoffee_tpu.command.train import _batch_iterator

    for name, model in nets.items():
        state = init_train_state(model, cfg5, tc, batch_size=128,
                                 rng=jax.random.PRNGKey(11))
        step_fn = jax.jit(make_train_step(model, cfg5, tc, batch_size=128),
                          donate_argnums=(0,))
        it = _batch_iterator(os.path.join(base, "shuffled5"), 128,
                             np.random.default_rng(7))
        for i in range(steps):
            _, batch = next(it)
            state, metrics = step_fn(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(23), i))
            if i % 500 == 0:
                logger.write(f"{name} step {i} loss {float(metrics['loss']):.3f}")
        trained[name] = jax.device_get(state.ema_params)
        logger.write(f"{name}: trained {steps} steps")

    out = {"rows": rows, "steps": steps, "games": games, "visits": visits}

    # --- held-out losses per size ---
    def val_losses(name, cfg, tag):
        model = nets[name]
        loss_fn = jax.jit(lambda pr, b: compute_losses(cfg, model, pr, b)[1])
        totals, wsum = {}, 0.0
        d = os.path.join(base, "heldout", tag, "selfplay", "random", "tdata_" + tag)
        for shard in iter_shards(d):
            batch = rows_to_batch(read_npz_rows(shard), cfg)
            m = loss_fn(trained[name], batch)
            w = float(m["weight_sum"])
            for k, v in m.items():
                if k != "weight_sum":
                    totals[k] = totals.get(k, 0.0) + float(v) * w
            wsum += w
        return {k: round(v / wsum, 4) for k, v in totals.items()
                if k in ("loss", "loss_policy", "loss_value")}

    out["heldout_loss"] = {}
    for tag, cfg in (("5x5w4", cfg5), ("7x7w5", cfg7)):
        out["heldout_loss"][tag] = {n: val_losses(n, cfg, tag) for n in nets}
        print("heldout", tag, out["heldout_loss"][tag], flush=True)

    # --- head-to-head at both sizes ---
    gate_sp = SearchParams.for_gatekeeper()
    for label, cfg in (("7x7w5", cfg7), ("5x5w4", cfg5)):
        bots = {n: make_nn_eval_fn(cfg, nets[n], trained[n]) for n in nets}
        records, elo = run_round_robin(
            cfg, bots, games, visits, sp=gate_sp, seed=17, logger=logger,
        )
        (na, nb, wa, wb, draws) = records[0]
        wins, losses = (wa, wb) if na == "ablated" else (wb, wa)
        diff = (elo.elos[elo.players.index("standard")]
                - elo.elos[elo.players.index("ablated")])
        sd = float(sum(x * x for x in elo.stdevs) ** 0.5)
        out[label] = {
            "ablated_wins": wins, "standard_wins": losses, "draws": draws,
            "elo_standard_minus_ablated": round(float(diff), 1),
            "elo_stdev": round(sd, 1),
        }
        print(label, out[label], flush=True)

    out["wall_s"] = round(time.time() - t0, 1)
    with open("/root/repo/artifacts/winlen_ablation.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out)[:400])


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw = dict(rows=int(sys.argv[1]), steps=int(sys.argv[2]),
                  games=int(sys.argv[3]), visits=int(sys.argv[4]))
        if len(sys.argv) > 5:
            kw["base"] = sys.argv[5]
    main(**kw)
