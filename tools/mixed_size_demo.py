#!/usr/bin/env python3
"""Mixed board-size training demo (VERDICT r3 item 4 'done' criterion):
ONE net trains on 5x5w4 + 7x7w5 selfplay data and beats its 5x5-only twin
on 7x7 while holding 5x5.

Pipeline (run on the real TPU; ~30-45 min):
  1. uniform-prior selfplay at both sizes (run_mixed_selfplay) and at 5x5
     only, equal total rows;
  2. shuffle per size; train two b2c32 nets with IDENTICAL step counts —
     'mixed' via run_training_mixed over both sizes, 'solo' via
     run_training on 5x5 only;
  3. head-to-head matches (batched match runner) mixed-vs-solo at 7x7w5
     and at 5x5w4, report win rates + Elo.

Writes artifacts/mixed_size_demo.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(base=None, games=160, rows=36000, steps=2000, visits=80):
    import jax

    from katacoffee_tpu.command.match import run_round_robin
    from katacoffee_tpu.command.selfplay import (
        SelfplayConfig,
        run_mixed_selfplay,
        run_selfplay_daemon,
    )
    from katacoffee_tpu.command.train import (
        TrainerConfig,
        run_training,
        run_training_mixed,
    )
    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.dataio.shuffle import shuffle_data
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.train import TrainConfig
    from katacoffee_tpu.utils import Logger
    from katacoffee_tpu.utils.elo import compute_elos

    t0 = time.time()
    base = base or "/root/repo/.runs/mixed_size_demo"
    logger = Logger(log_to_stdout=True)
    cfg5 = GameConfig(5, 5, 4)
    cfg7 = GameConfig(7, 7, 5)
    sp = SearchParams.for_selfplay()

    # --- 1. data ---
    spc = SelfplayConfig(batch_size=128, num_sims=100, moves_per_segment=16,
                         segments_per_flush=4, seed=3)
    mixed_base = os.path.join(base, "mixed")
    solo_base = os.path.join(base, "solo")
    import dataclasses

    # stages are resumable: selfplay/shuffle/train each skip when their
    # output already exists (the demo runs in long TPU stints)
    if not os.path.isdir(os.path.join(mixed_base, "selfplay")):
        # 7x7 gets double weight: it is the transfer target, and its rows
        # are what the solo twin never sees
        run_mixed_selfplay(
            mixed_base, [(cfg5, 1.0), (cfg7, 2.0)], sp, spc, logger,
            rows_per_pass=rows, max_passes=1,
        )
    if not os.path.isdir(os.path.join(solo_base, "selfplay")):
        run_selfplay_daemon(
            solo_base, cfg5, sp,
            dataclasses.replace(spc, max_rows=rows, data_tag="5x5w4"), logger,
        )

    # --- 2. shuffle per size + train twins ---
    for b, tags in ((mixed_base, ["5x5w4", "7x7w5"]), (solo_base, ["5x5w4"])):
        for tag in tags:
            if os.path.isdir(os.path.join(b, "shuffleddata", tag)):
                continue
            shuffle_data(
                [os.path.join(b, "selfplay", "random", "tdata_" + tag)],
                os.path.join(b, "shuffleddata", tag),
                min_rows=10**9,
                seed=5,
            )
    tc = TrainConfig(warmup_steps=20, symmetry_augment=True)
    trc = TrainerConfig(model="b2c32", batch_size=128, max_steps=steps,
                        steps_per_export=10**9, checkpoint_every=10**9,
                        max_epochs_per_data=10**9, seed=11)
    if not os.path.isdir(os.path.join(mixed_base, "modelstobetested")):
        run_training_mixed(mixed_base, [cfg5, cfg7], tc, trc, logger)
    if not os.path.isdir(os.path.join(solo_base, "modelstobetested")):
        # the solo twin uses the same per-size shuffle layout with one size
        run_training_mixed(solo_base, [cfg5], tc, trc, logger)

    def latest_eval_fn(b, cfg):
        d = os.path.join(b, "modelstobetested")
        name = sorted(os.listdir(d))[-1]
        # rebuild at the EXPORTED win_len: conv/head params carry no H/W so
        # the net runs at any board size, but the longest-line aux head's
        # class count is win_len+1 — it must match the trained params (the
        # eval path never reads that head, so the target size's win_len is
        # irrelevant here)
        _, params, _, meta = load_exported_model(os.path.join(d, name))
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet

        model = CoffeeNet(get_model_spec(meta["model"]), win_len=meta["win_len"])
        return make_nn_eval_fn(cfg, model, params)

    # --- 3. matches ---
    out = {"games": games, "rows": rows, "steps": steps, "visits": visits}
    gate_sp = SearchParams.for_gatekeeper()
    for label, cfg in (("7x7w5", cfg7), ("5x5w4", cfg5)):
        mixed_fn = latest_eval_fn(mixed_base, cfg)
        solo_fn = latest_eval_fn(solo_base, cfg)
        records, elo = run_round_robin(
            cfg, {"mixed": mixed_fn, "solo": solo_fn}, games,
            visits, sp=gate_sp, seed=17, logger=logger,
        )
        (na, nb, wa, wb, draws) = records[0]
        wins, losses = (wa, wb) if na == "mixed" else (wb, wa)
        diff = elo.elos[elo.players.index("mixed")] - elo.elos[elo.players.index("solo")]
        sd = float(sum(x * x for x in elo.stdevs) ** 0.5)
        out[label] = {
            "mixed_wins": wins, "solo_wins": losses, "draws": draws,
            "elo_mixed_minus_solo": float(diff), "elo_stdev": sd,
        }
        print(label, out[label], flush=True)

    # --- 4. raw-net probes. Search at match visits partially masks net
    # quality (the win_len-relative threat planes + win_len global input,
    # features.py ch15-17/glob0, transfer a 5x5w4 net to 7x7w5 BY DESIGN —
    # the reference's own nninputs.cpp:656 semantics), so also measure what
    # mixed training changes directly: held-out loss per size (fresh
    # uniform-prior selfplay rows, unseen by both nets) and a low-visit
    # match where play tracks raw priors/values more closely. ---
    from katacoffee_tpu.dataio.trainingwrite import iter_shards, read_npz_rows, rows_to_batch
    from katacoffee_tpu.train import compute_losses

    held_base = os.path.join(base, "heldout")
    for tag, cfg in (("5x5w4", cfg5), ("7x7w5", cfg7)):
        d = os.path.join(held_base, tag)
        if not os.path.isdir(os.path.join(d, "selfplay")):
            run_selfplay_daemon(
                d, cfg, sp,
                dataclasses.replace(spc, max_rows=4000, data_tag=tag, seed=991),
                logger,
            )

    def val_losses(model_base, cfg, tag):
        d = os.path.join(model_base, "modelstobetested")
        name = sorted(os.listdir(d))[-1]
        model, params, _, meta = load_exported_model(os.path.join(d, name))
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet

        model = CoffeeNet(get_model_spec(meta["model"]), win_len=meta["win_len"])
        loss_fn = jax.jit(lambda pr, b: compute_losses(cfg, model, pr, b)[1])
        totals, wsum = {}, 0.0
        data_dir = os.path.join(held_base, tag, "selfplay", "random", "tdata_" + tag)
        for shard in iter_shards(data_dir):
            batch = rows_to_batch(read_npz_rows(shard), cfg)
            m = loss_fn(params, batch)
            w = float(m["weight_sum"])
            for k, v in m.items():
                if k != "weight_sum":
                    totals[k] = totals.get(k, 0.0) + float(v) * w
            wsum += w
        return {k: round(v / wsum, 4) for k, v in totals.items() if k in
                ("loss", "loss_policy", "loss_value", "loss_ownership")}

    out["heldout_loss"] = {}
    for tag, cfg in (("5x5w4", cfg5), ("7x7w5", cfg7)):
        out["heldout_loss"][tag] = {
            "mixed": val_losses(mixed_base, cfg, tag),
            "solo": val_losses(solo_base, cfg, tag),
        }
        print("heldout", tag, out["heldout_loss"][tag], flush=True)

    for label, cfg in (("7x7w5_lowvisit", cfg7),):
        mixed_fn = latest_eval_fn(mixed_base, cfg)
        solo_fn = latest_eval_fn(solo_base, cfg)
        records, elo = run_round_robin(
            cfg, {"mixed": mixed_fn, "solo": solo_fn}, games, 24,
            sp=gate_sp, seed=29, logger=logger,
        )
        (na, nb, wa, wb, draws) = records[0]
        wins, losses = (wa, wb) if na == "mixed" else (wb, wa)
        diff = elo.elos[elo.players.index("mixed")] - elo.elos[elo.players.index("solo")]
        sd = float(sum(x * x for x in elo.stdevs) ** 0.5)
        out[label] = {
            "mixed_wins": wins, "solo_wins": losses, "draws": draws,
            "elo_mixed_minus_solo": float(diff), "elo_stdev": sd,
        }
        print(label, out[label], flush=True)

    out["wall_s"] = time.time() - t0
    os.makedirs("/root/repo/artifacts", exist_ok=True)
    with open("/root/repo/artifacts/mixed_size_demo.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:2])
