"""Training step — the reference trainer (`python/train.py`) re-designed for
TPU: one jitted step, data-parallel over a `jax.sharding.Mesh` via sharding
annotations (psum-equivalent gradient reduction is inserted by XLA over ICI),
replacing torch DDP/NCCL (train.py:127-135,402-403; SURVEY.md §2.8 P5).

Kept from the reference: SGD+momentum with per-group weight decay (output
heads and biases/gates un-decayed), LR warmup + scale, gradient clipping, EMA
weights for export (the reference's SWA, train.py:644 context).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.selfplay.actor import TrainingBatch
from katacoffee_tpu.train.losses import compute_losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 0.02  # LR at batch_scale samples/step; scaled by batch
    batch_scale: float = 256.0
    momentum: float = 0.9
    weight_decay: float = 3e-5
    grad_clip: float = 8.0
    warmup_steps: int = 100
    ema_decay: float = 0.999
    symmetry_augment: bool = True
    # random history-masking augmentation (trainingwrite.cpp:438-448 /
    # data_processing_pytorch.py:128-201); see losses.compute_losses
    history_mask: bool = True
    history_keep_prob: float = 0.98


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array


def _decay_mask(params):
    """Weight decay applies to conv/dense kernels only, not biases or ReZero
    gates (the reference's reg_dict output/noreg split)."""

    def mask_fn(path, leaf):
        name = jax.tree_util.keystr(path)
        return ("kernel" in name) and leaf.ndim > 1

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(tc: TrainConfig, batch_size: int):
    # learning_rate is defined at batch_scale samples/step and scaled
    # linearly with the actual global batch (the reference scales LR by
    # world size, train.py:291-330)
    lr = tc.learning_rate * (batch_size / tc.batch_scale)
    schedule = optax.linear_schedule(0.0, lr, tc.warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.add_decayed_weights(tc.weight_decay, mask=_decay_mask),
        optax.sgd(learning_rate=schedule, momentum=tc.momentum, nesterov=True),
    )


def init_train_state(model, cfg: GameConfig, tc: TrainConfig, batch_size: int, rng):
    from katacoffee_tpu.nn.model import init_params

    params = init_params(model, cfg, rng)
    opt = make_optimizer(tc, batch_size)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        # distinct buffers: the train step donates the whole state, and XLA
        # rejects donating the same buffer twice
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, cfg: GameConfig, tc: TrainConfig, batch_size: int):
    """Plain (single-device or auto-sharded) jitted train step."""
    opt = make_optimizer(tc, batch_size)

    def train_step(state: TrainState, batch: TrainingBatch, rng):
        sym_rng = rng if tc.symmetry_augment else None
        hist_rng = jax.random.fold_in(rng, 0x415) if tc.history_mask else None

        def loss_fn(p):
            return compute_losses(
                cfg, model, p, batch, symmetrize_rng=sym_rng,
                history_mask_rng=hist_rng,
                history_keep_prob=tc.history_keep_prob,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * tc.ema_decay + p * (1.0 - tc.ema_decay),
            state.ema_params,
            params,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, ema, state.step + 1), metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_sharded_train_step(model, cfg: GameConfig, tc: TrainConfig, batch_size: int, mesh: Mesh):
    """Data-parallel train step over `mesh` axis 'data': params replicated,
    batch sharded; XLA inserts the gradient all-reduce over ICI (the NCCL
    allreduce of the reference, train.py:403)."""
    step_fn = make_train_step(model, cfg, tc, batch_size)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))

    def shard_batch(batch: TrainingBatch) -> TrainingBatch:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharded), batch
        )

    def place_state(state: TrainState) -> TrainState:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated), state)

    return step_fn, shard_batch, place_state
