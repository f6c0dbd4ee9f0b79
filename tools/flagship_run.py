"""Flagship strength run (VERDICT round-1 item 2): sustained b6c96 loop at
the reference operating point — 600-visit selfplay, gatekeeper at 200
games / 150 visits — through >= 5 promotions, then a round-robin Elo table
over every promoted net (+ uniform-prior 'random'), i.e. the gated Elo
curve vs cumulative selfplay data for docs/TrainingDemo.md §3.

Run on the real TPU:  python tools/flagship_run.py <base_dir> [max_cycles] [target_promos]
Resumable at two levels:
  * same base_dir → continues from the promoted models + trainer checkpoint
    + data already on disk (every stage is stateless+polling, like the
    reference loop);
  * fresh base_dir (e.g. a new sandbox where the gitignored .runs/ is gone)
    → seeds itself from the committed `artifacts/flagship_b6c96/` snapshot
    (promoted models + trainer checkpoint), and syncs that snapshot back
    after every cycle so run progress survives across sandboxes/rounds.
`max_cycles 0` skips the loop and just (re)fits the Elo table over the
promoted models currently on disk.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def _artifacts_dir(base_dir: str) -> str:
    # artifacts mirror is named after the run dir (flagship_b6c96,
    # flagship_b10c128, ...) so several flagship runs can coexist
    return os.path.join(
        os.path.dirname(__file__), "..", "artifacts", os.path.basename(os.path.normpath(base_dir))
    )


def _promoted_models(base_dir: str):
    d = os.path.join(base_dir, "models")
    if not os.path.isdir(d):
        return []
    return sorted(
        m for m in os.listdir(d) if os.path.isfile(os.path.join(d, m, "model.npz"))
    )


def seed_from_artifacts(base_dir: str, logger) -> None:
    """Copy the committed snapshot (promoted models + trainer checkpoint)
    into a fresh base_dir so the run continues where the last round stopped."""
    art = os.path.abspath(_artifacts_dir(base_dir))
    if not os.path.isdir(os.path.join(art, "models")):
        return
    have = set(_promoted_models(base_dir))
    for m in sorted(os.listdir(os.path.join(art, "models"))):
        src = os.path.join(art, "models", m)
        if m in have or not os.path.isdir(src):
            continue
        shutil.copytree(src, os.path.join(base_dir, "models", m))
        logger.write(f"flagship: seeded promoted model {m} from artifacts")
    # run_training keeps its checkpoint under train/<run_name>/ (run_name
    # "run"); earlier revisions synced the wrong path (train/checkpoint.ckpt),
    # which silently reset the trainer to step 0 in fresh sandboxes — accept
    # either location when seeding.
    dst = os.path.join(base_dir, "train", "run", "checkpoint.ckpt")
    for ck in (
        os.path.join(art, "train", "run", "checkpoint.ckpt"),
        os.path.join(art, "train", "checkpoint.ckpt"),
    ):
        if os.path.isfile(ck) and not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(ck, dst)
            logger.write("flagship: seeded trainer checkpoint from artifacts")
            break


def sync_to_artifacts(base_dir: str, logger) -> None:
    """Mirror the durable run state into the tracked artifacts dir."""
    art = os.path.abspath(_artifacts_dir(base_dir))
    os.makedirs(os.path.join(art, "models"), exist_ok=True)
    for m in _promoted_models(base_dir):
        dst = os.path.join(art, "models", m)
        if not os.path.isdir(dst):
            shutil.copytree(os.path.join(base_dir, "models", m), dst)
    ck = os.path.join(base_dir, "train", "run", "checkpoint.ckpt")
    if os.path.isfile(ck):
        os.makedirs(os.path.join(art, "train", "run"), exist_ok=True)
        shutil.copy2(ck, os.path.join(art, "train", "run", "checkpoint.ckpt"))
    for f in ("flagship_log.txt", "flagship_elos.json"):
        src = os.path.join(base_dir, f)
        if os.path.isfile(src):
            shutil.copy2(src, os.path.join(art, f))
    logger.write(f"flagship: synced {len(_promoted_models(base_dir))} models to artifacts")


def warmstart_trainer_from_champion(base_dir: str, lc, cfg, logger) -> None:
    """If the trainer checkpoint is gone (lost sandbox / the old wrong-path
    sync) but promoted models exist, synthesize a checkpoint whose params AND
    EMA are the latest champion's exported weights, with the step counter set
    to the champion's train_step. Without this, a resumed run restarts the
    trainer from random init and every candidate loses the gate until it
    re-earns ~champion strength (observed: s400..s1200 all rejected vs
    run-s2800). Mirrors the reference loop's property that the trainer state
    always continues from the strongest lineage (train.py:253-289 resume)."""
    ckpt = os.path.join(base_dir, "train", "run", "checkpoint.ckpt")
    if os.path.exists(ckpt):
        return
    models = _promoted_models(base_dir)
    if not models:
        return
    import jax
    import jax.numpy as jnp

    from katacoffee_tpu.dataio.checkpoints import load_exported_model, save_checkpoint
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet
    from katacoffee_tpu.train import TrainConfig, init_train_state

    latest = max(models, key=lambda m: int(m.rsplit("-s", 1)[1]))
    step = int(latest.rsplit("-s", 1)[1])
    model, params, mcfg, meta = load_exported_model(os.path.join(base_dir, "models", latest))
    # Derive the spec from the champion's own exported meta, not the CLI
    # model arg: resuming e.g. flagship_b10c128 with the default arg would
    # otherwise graft differently-shaped champion params into a b6c96 train
    # state (ADVICE r4). The CLI arg is only cross-checked.
    champ_model = meta.get("model", lc.model)
    if champ_model != lc.model:
        logger.write(
            f"flagship: champion meta says model={champ_model}, overriding "
            f"CLI/default '{lc.model}' for the warm-started train state"
        )
    tc = TrainConfig(
        learning_rate=lc.learning_rate, warmup_samples_scale=lc.warmup_samples_scale
    )
    state = init_train_state(
        CoffeeNet(get_model_spec(champ_model), win_len=cfg.win_len),
        cfg, tc, batch_size=lc.train_batch, rng=jax.random.PRNGKey(lc.seed),
    )
    state = state._replace(
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.asarray(step, jnp.int32),
    )
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    save_checkpoint(ckpt, state, extra={"train_step": step, "warmstart_from": latest})
    logger.write(f"flagship: warm-started trainer from champion {latest} (step {step})")


def main(base_dir: str, max_cycles: int = 24, target_promotions: int = 5, model: str = "b6c96"):
    from katacoffee_tpu.command.loop import LoopConfig, run_loop
    from katacoffee_tpu.command.match import run_round_robin
    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import make_nn_eval_fn, uniform_eval_fn
    from katacoffee_tpu.utils import Logger

    cfg = GameConfig(5, 5, 4)
    os.makedirs(base_dir, exist_ok=True)
    logger = Logger(log_to_stdout=True)
    logger.add_file(os.path.join(base_dir, "flagship_log.txt"))
    seed_from_artifacts(base_dir, logger)

    # When resuming a run that already has promoted models, the models' own
    # exported meta is authoritative for the architecture — a forgotten 4th
    # CLI arg must not graft e.g. b10c128 champion params into a b6c96 train
    # state (ADVICE r4). CLI arg only matters for brand-new runs.
    promoted = _promoted_models(base_dir)
    if promoted:
        latest = max(promoted, key=lambda m: int(m.rsplit("-s", 1)[1]))
        with open(os.path.join(base_dir, "models", latest, "model.json")) as f:
            champ_model = json.load(f).get("model", model)
        if champ_model != model:
            logger.write(
                f"flagship: run's champion is {champ_model}; overriding CLI "
                f"model arg '{model}'"
            )
            model = champ_model

    lc = LoopConfig(
        num_cycles=1,  # driven one cycle at a time so we can stop at the target
        rows_per_cycle=24000,
        selfplay_batch=256,
        selfplay_visits=600,          # selfplay1.cfg:84 op point
        train_steps_per_cycle=400,
        train_batch=128,
        model=model,
        gate_games=200,               # gatekeeper1.cfg op point
        gate_visits=150,
        use_gatekeeper=True,
        seed=7,
    )
    warmstart_trainer_from_champion(base_dir, lc, cfg, logger)

    t0 = time.time()
    for cycle in range(max_cycles):
        promos = len(_promoted_models(base_dir))
        logger.write(
            f"flagship: cycle {cycle}, total promotions {promos} "
            f"(wall {time.time() - t0:.0f}s)"
        )
        if promos >= target_promotions:
            break
        import dataclasses

        # seed varies by total promotions + cycle so re-runs across sandboxes
        # never replay identical selfplay streams
        run_loop(
            base_dir, cfg, dataclasses.replace(lc, seed=lc.seed + 13 * promos + cycle),
            logger,
        )
        sync_to_artifacts(base_dir, logger)

    # ---- Elo table over every promoted net + uniform-prior baseline ----
    models = _promoted_models(base_dir)
    logger.write(f"flagship: final Elo round-robin over {models} + random")
    bots = {"random": uniform_eval_fn(cfg)}
    for m in models:
        model, params, mcfg, meta = load_exported_model(os.path.join(base_dir, "models", m))
        bots[m] = make_nn_eval_fn(cfg, model, params)
    records, elos = run_round_robin(
        cfg, bots, num_games_per_pair=120, num_visits=150,
        seed=123, sgf_dir=os.path.join(base_dir, "elosgfs"), logger=logger,
    )
    table = {k: [round(v[0], 1), round(v[1], 1)] for k, v in elos.as_dict().items()}
    out = {
        "models": models,
        "elos": table,
        "records": records,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(base_dir, "flagship_elos.json"), "w") as f:
        json.dump(out, f, indent=2)
    logger.write("ELOS: " + json.dumps(table))
    sync_to_artifacts(base_dir, logger)


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/flagship"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    target = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    model = sys.argv[4] if len(sys.argv) > 4 else "b6c96"
    main(base, cycles, target, model)
