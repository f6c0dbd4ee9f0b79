"""Trainer daemon/command.

The role of the reference's `python/train.py` (§3.4 call stack): stream
shuffled npz chunks, run the jitted train step (data-parallel over the device
mesh — torch-DDP/NCCL replaced by sharding annotations + XLA ICI collectives,
SURVEY.md §2.8 P5), keep EMA weights, checkpoint with rotation, append
JSON-lines metrics, and export models for selfplay/gating on a sample
schedule (the reference's torchmodels_toexport → export_model_pytorch.py bus,
train.py:253-289).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.dataio.checkpoints import (
    export_model,
    load_checkpoint,
    save_checkpoint,
)
from katacoffee_tpu.dataio.trainingwrite import iter_shards, read_npz_rows, rows_to_batch
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet
from katacoffee_tpu.selfplay.actor import TrainingBatch
from katacoffee_tpu.train import TrainConfig, init_train_state, make_train_step
from katacoffee_tpu.train.train import current_lr
from katacoffee_tpu.utils import Logger


@dataclasses.dataclass
class TrainerConfig:
    model: str = "b6c96"
    batch_size: int = 256
    steps_per_export: int = 500
    checkpoint_every: int = 200
    max_steps: int | None = None
    max_epochs_per_data: int = 8  # reference loop's ≤8 passes/row (synchronous_loop.sh:66)
    seed: int = 0
    # data-parallel over all visible devices when the batch divides evenly
    # (the torch-DDP/NCCL role, SURVEY.md §2.8 P5)
    use_mesh: bool = True


def _batch_iterator(shuffled_dir: str, batch_size: int, rng: np.random.Generator,
                    stride: int = 1, offset: int = 0):
    """Yield fixed-size batches from the shuffled chunks, looping, reshuffling
    chunk order per epoch. Yields (epoch, TrainingBatch).

    Multi-host (`stride` = process_count, `offset` = process_index): every
    process runs the SAME seeded iterator (identical shard order and row
    permutations) but consumes only every stride-th batch — disjoint rows per
    host, the role of torch's DistributedSampler in the reference's DDP loop
    (train.py:403)."""
    epoch = 0
    bi = 0
    while True:
        shards = list(iter_shards(shuffled_dir))
        if not shards:
            yield None, None
            continue
        order = rng.permutation(len(shards))
        for si in order:
            data = read_npz_rows(shards[si])
            batch = rows_to_batch(data, None)
            n = int(batch.weight.shape[0])
            perm = rng.permutation(n)
            arrays = jax.tree_util.tree_map(lambda x: np.asarray(x)[perm], batch)
            start = 0
            while start + batch_size <= n:
                if bi % stride == offset:
                    yield epoch, jax.tree_util.tree_map(
                        lambda x: jnp.asarray(x[start : start + batch_size]), arrays
                    )
                bi += 1
                start += batch_size
        epoch += 1


def run_training_mixed(
    base_dir: str,
    cfgs: list,
    tc: TrainConfig,
    trc: TrainerConfig,
    logger: Logger | None = None,
    export_to: str = "modelstobetested",
    run_name: str = "run",
) -> int:
    """Mixed-board-size training: ONE net (the CoffeeNet trunk/heads are
    shape-polymorphic — conv kernels and gpool'd heads carry no H/W — and
    the bscale gpool channel encodes size) trained on several sizes at once.
    The reference trains mixed sizes by padding rows to nnXLen×nnYLen inside
    one batch (python/data_processing_pytorch.py); padding every row to the
    max size would make XLA process 2x dead cells at the small size, so we
    instead compile ONE train step per shape and alternate steps over the
    per-size shuffle dirs `shuffleddata/<XxYwW>/`, sampling each size
    proportionally to its available rows. Shared params + optimizer state;
    rotating checkpoint compatible with run_training's.

    Returns steps done. Expects data from run_mixed_selfplay shuffled per
    size (tools/mixed_size_demo.py shows the full loop)."""
    logger = logger or Logger(log_to_stdout=True)
    shuffled_base = os.path.join(base_dir, "shuffleddata")
    train_dir = os.path.join(base_dir, "train", run_name)
    os.makedirs(train_dir, exist_ok=True)
    metrics_path = os.path.join(train_dir, "metrics_train.json")
    ckpt_path = os.path.join(train_dir, "checkpoint.ckpt")

    tags = [f"{c.x_size}x{c.y_size}w{c.win_len}" for c in cfgs]
    dirs = [os.path.join(shuffled_base, t) for t in tags]
    rows = []
    for d in dirs:
        n = 0
        if os.path.isdir(d):
            for s in iter_shards(d):
                with np.load(s) as z:
                    n += int(z["weight"].shape[0])
        rows.append(n)
    if not any(rows):
        raise FileNotFoundError(f"no shuffled data under {shuffled_base}/{tags}")

    # the line-aux head is sized for the LARGEST win_len; every other param
    # is shape-independent (losses.py one-hots to the head's class count)
    max_wl = max(c.win_len for c in cfgs)
    # exported meta must carry the head-sizing win_len so reloads rebuild
    # the identical param tree
    export_cfg = GameConfig(cfgs[0].x_size, cfgs[0].y_size, max_wl)
    model = CoffeeNet(get_model_spec(trc.model), win_len=max_wl)
    state = init_train_state(
        model, cfgs[0], tc, batch_size=trc.batch_size,
        rng=jax.random.PRNGKey(trc.seed),
    )
    start_step = 0
    if os.path.exists(ckpt_path):
        state, meta = load_checkpoint(ckpt_path, state)
        start_step = int(meta.get("train_step", int(state.step)))
        logger.write(f"train-mixed: resumed from step {start_step}")

    step_fns = [
        make_train_step(model, c, tc, batch_size=trc.batch_size) for c in cfgs
    ]
    rng = np.random.default_rng(trc.seed + start_step)
    iters = [
        _batch_iterator(d, trc.batch_size, np.random.default_rng(trc.seed + 7 * i))
        for i, d in enumerate(dirs)
    ]
    probs = np.asarray(rows, np.float64)
    probs = probs / probs.sum()
    key = jax.random.PRNGKey(trc.seed + 1)

    steps = 0
    mfile = open(metrics_path, "a")
    logger.write(
        "train-mixed: sizes " + ", ".join(f"{t}:{r} rows" for t, r in zip(tags, rows))
    )
    while trc.max_steps is None or steps < trc.max_steps:
        i = int(rng.choice(len(cfgs), p=probs))
        epoch, batch = next(iters[i])
        if batch is None:
            continue
        if epoch >= trc.max_epochs_per_data:
            break
        key, k = jax.random.split(key)
        state, metrics = step_fns[i](state, batch, k)
        steps += 1
        gstep = start_step + steps
        if steps % 50 == 0 or steps == 1:
            m = {k2: float(v) for k2, v in metrics.items()}
            m.update(step=gstep, size=tags[i], time=time.time())
            mfile.write(json.dumps(m) + "\n")
            mfile.flush()
            logger.write(
                f"train-mixed: step {gstep} [{tags[i]}] loss {m['loss']:.4f}"
            )
        if steps % trc.checkpoint_every == 0:
            save_checkpoint(ckpt_path, state, extra={"train_step": gstep})
        if steps % trc.steps_per_export == 0:
            _export(base_dir, export_to, run_name, gstep, state, trc, export_cfg, logger)

    save_checkpoint(ckpt_path, state, extra={"train_step": start_step + steps})
    _export(base_dir, export_to, run_name, start_step + steps, state, trc, export_cfg, logger)
    mfile.close()
    return steps


def run_training(
    base_dir: str,
    cfg: GameConfig,
    tc: TrainConfig,
    trc: TrainerConfig,
    logger: Logger | None = None,
    export_to: str = "modelstobetested",
    run_name: str = "run",
) -> int:
    """Train until max_steps (or forever). Returns steps done this call."""
    logger = logger or Logger(log_to_stdout=True)
    shuffled_dir = os.path.join(base_dir, "shuffleddata")
    train_dir = os.path.join(base_dir, "train", run_name)
    os.makedirs(train_dir, exist_ok=True)
    metrics_path = os.path.join(train_dir, "metrics_train.json")
    metrics_val_path = os.path.join(train_dir, "metrics_val.json")
    val_dir = os.path.join(shuffled_dir, "val")
    ckpt_path = os.path.join(train_dir, "checkpoint.ckpt")

    model = CoffeeNet(get_model_spec(trc.model), win_len=cfg.win_len)
    state = init_train_state(
        model, cfg, tc, batch_size=trc.batch_size, rng=jax.random.PRNGKey(trc.seed)
    )
    start_step = 0
    if os.path.exists(ckpt_path):
        state, meta = load_checkpoint(ckpt_path, state)
        start_step = int(meta.get("train_step", int(state.step)))
        logger.write(f"train: resumed from step {start_step}")

    n_dev = len(jax.devices())
    shard_batch = None
    multi = False  # mesh spans other hosts' chips (DCN data parallelism)
    if trc.use_mesh and n_dev > 1 and trc.batch_size % n_dev == 0:
        from katacoffee_tpu.parallel import make_data_mesh
        from katacoffee_tpu.train import make_sharded_train_step

        mesh = make_data_mesh()
        multi = len({d.process_index for d in mesh.devices.flat}) > 1
        step_fn, shard_batch, place_state = make_sharded_train_step(
            model, cfg, tc, batch_size=trc.batch_size, mesh=mesh
        )
        state = place_state(state)
        logger.write(
            f"train: data-parallel over {n_dev} devices"
            + (f" on {jax.process_count()} hosts" if multi else "")
        )
    else:
        step_fn = make_train_step(model, cfg, tc, batch_size=trc.batch_size)
    rng = np.random.default_rng(trc.seed + start_step)
    key = jax.random.PRNGKey(trc.seed + 1)

    # multi-host: same seeded iterator everywhere, each host consumes every
    # pc-th local-size batch (disjoint rows; DistributedSampler role)
    pc, pid = (jax.process_count(), jax.process_index()) if multi else (1, 0)
    batches = _batch_iterator(
        shuffled_dir, trc.batch_size // pc, rng, stride=pc, offset=pid
    )
    is_writer = pid == 0  # one host owns checkpoints/exports/metrics files
    from katacoffee_tpu.parallel.mesh import local_rows

    def host_state():
        # replicated-but-global arrays can't be np.asarray'd directly on a
        # multi-host mesh; pull this host's copy of every leaf
        return local_rows(state) if multi else state

    steps = 0
    t0 = time.monotonic()
    mfile = open(metrics_path, "a") if is_writer else None
    while trc.max_steps is None or steps < trc.max_steps:
        epoch, batch = next(batches)
        if batch is None:
            logger.write("train: no shuffled data yet, waiting")
            time.sleep(5)
            continue
        if epoch >= trc.max_epochs_per_data:
            break
        key, k = jax.random.split(key)
        if shard_batch is not None:
            batch = shard_batch(batch)
        state, metrics = step_fn(state, batch, k)
        steps += 1
        gstep = start_step + steps

        if (steps % 50 == 0 or steps == 1) and is_writer:
            m = {k2: float(v) for k2, v in local_rows(metrics).items()}
            m.update(step=gstep, epoch=epoch, time=time.time(),
                     p_lr=current_lr(tc, trc.batch_size, gstep))
            mfile.write(json.dumps(m) + "\n")
            mfile.flush()
            logger.write(
                f"train: step {gstep} loss {m['loss']:.4f} p {m['loss_policy']:.4f} "
                f"v {m['loss_value']:.4f} ({steps / max(time.monotonic()-t0, 1e-9):.2f} steps/s)"
            )
        if steps % trc.checkpoint_every == 0 and is_writer:
            hs = host_state()
            save_checkpoint(ckpt_path, hs, extra={"train_step": gstep})
            _val_metrics(model, cfg, hs, val_dir, trc, metrics_val_path, gstep, logger)
        if steps % trc.steps_per_export == 0 and is_writer:
            _export(base_dir, export_to, run_name, gstep, host_state(), trc, cfg, logger)

    if is_writer:
        hs = host_state()
        save_checkpoint(ckpt_path, hs, extra={"train_step": start_step + steps})
        _val_metrics(model, cfg, hs, val_dir, trc, metrics_val_path, start_step + steps, logger)
        _export(base_dir, export_to, run_name, start_step + steps, hs, trc, cfg, logger)
        mfile.close()
    return steps


def _val_metrics(model, cfg, state, val_dir, trc, metrics_val_path, gstep, logger,
                 max_rows: int = 4096):
    """Evaluate the current params on the held-out shuffle split and append a
    JSON line (metrics_val_rank*.json role, train.py:880-886)."""
    if not os.path.isdir(val_dir):
        return
    shards = list(iter_shards(val_dir))
    if not shards:
        return
    from katacoffee_tpu.train import compute_losses

    totals: dict[str, float] = {}
    wsum = 0.0
    rows = 0
    loss_fn = jax.jit(lambda p, b: compute_losses(cfg, model, p, b)[1])
    for s in shards:
        batch = rows_to_batch(read_npz_rows(s), cfg)
        n = int(batch.weight.shape[0])
        if n == 0:
            continue
        m = loss_fn(state.params, batch)
        w = float(m["weight_sum"])
        for k2, v in m.items():
            totals[k2] = totals.get(k2, 0.0) + float(v) * (w if k2 != "weight_sum" else 1.0)
        wsum += w
        rows += n
        if rows >= max_rows:
            break
    if wsum <= 0:
        return
    out = {k2: (v / wsum if k2 != "weight_sum" else v) for k2, v in totals.items()}
    out.update(step=gstep, rows=rows, time=time.time())
    with open(metrics_val_path, "a") as f:
        f.write(json.dumps(out) + "\n")
    logger.write(f"train: val loss {out['loss']:.4f} on {rows} rows")


def _export(base_dir, export_to, run_name, gstep, state, trc, cfg, logger):
    name = f"{run_name}-s{gstep}"
    out = export_model(
        os.path.join(base_dir, export_to),
        name,
        state.ema_params,  # EMA weights are what ships (train.py SWA export)
        trc.model,
        cfg,
        extra={"train_step": gstep},
    )
    logger.write(f"train: exported {out}")
    return out


def main(argv, **kw):
    import argparse

    from katacoffee_tpu.utils import ConfigParser

    ap = argparse.ArgumentParser(prog="katacoffee train")
    ap.add_argument("-base-dir", required=True)
    ap.add_argument("-config", default=None)
    ap.add_argument("-override-config", default=None)
    args = ap.parse_args(argv)
    c = ConfigParser(args.config, overrides=args.override_config) if args.config else ConfigParser(text="")
    if args.override_config and not args.config:
        c.apply_overrides(args.override_config)

    cfg = GameConfig(c.get_int("xSize", 5), c.get_int("ySize", 5), c.get_int("winLen", 4))
    tc = TrainConfig(
        learning_rate=c.get_float("learningRate", 0.02),
        lr_schedule=c.get_string("lrSchedule", "stepwise"),
        warmup_samples_scale=c.get_float("warmupSamplesScale", 1.0),
        output_head_lr_scale=c.get_float("outputHeadLrScale", 0.5),
    )
    trc = TrainerConfig(
        model=c.get_string("model", "b6c96"),
        batch_size=c.get_int("batchSize", 256),
        max_steps=c.get_int("maxSteps", 0) or None,
        steps_per_export=c.get_int("stepsPerExport", 500),
        seed=c.get_int("seed", 0),
    )
    logger = Logger(log_to_stdout=True)
    c.warn_unused(logger)
    run_training(args.base_dir, cfg, tc, trc, logger)
