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
import numpy as np
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
    # LR schedule policy (reference train.py:569-603 "fixup" row — our net is
    # ReZero, the fixup-family norm kind): a stepped warmup keyed on SAMPLES
    # seen, not steps, ramping 1/5 → 1/3 → 1/2 → 1/1.4 → 1. "linear" keeps the
    # old warmup_steps ramp. warmup_samples_scale shrinks the reference's
    # 1M/2M/4M/6M sample thresholds for small boards/runs.
    lr_schedule: str = "stepwise"
    warmup_samples_scale: float = 1.0
    # Output heads train at half LR (train.py:610-620 group_scale=0.5 for
    # "output"/"output_noreg" groups).
    output_head_lr_scale: float = 0.5


# Reference stepped warmup for fixup-family norms (train.py:574-582):
# (samples_threshold, scale) pairs; above the last threshold scale is 1.
_FIXUP_WARMUP_STEPS = (
    (1_000_000, 1.0 / 5.0),
    (2_000_000, 1.0 / 3.0),
    (4_000_000, 1.0 / 2.0),
    (6_000_000, 1.0 / 1.4),
)


def warmup_scale_at(samples: float, samples_scale: float = 1.0) -> float:
    """The reference's warmup_scale for fixup-family nets at a given global
    sample count (train.py:574-582), with thresholds scaled by
    samples_scale."""
    for threshold, scale in _FIXUP_WARMUP_STEPS:
        if samples < threshold * samples_scale:
            return scale
    return 1.0


def _is_output_head(path) -> bool:
    name = jax.tree_util.keystr(path)
    return ("PolicyHead" in name) or ("ValueHead" in name)


def _scale_output_heads(scale: float):
    """Per-group LR: multiply output-head updates by `scale`
    (train.py:610-620)."""

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * scale if _is_output_head(path) else u, updates
        )
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


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
    # linearly with the actual global batch (the reference's per-sample LR
    # semantics: group lr = per_sample_lr * warmup_scale * group_scale,
    # train.py:570,626-628)
    lr = tc.learning_rate * (batch_size / tc.batch_scale)
    if tc.lr_schedule == "stepwise":
        # step → samples seen; jnp.piecewise-free formulation so the schedule
        # traces cleanly inside jit
        thresholds = jnp.array(
            [t * tc.warmup_samples_scale for t, _ in _FIXUP_WARMUP_STEPS]
        )
        scales = jnp.array([s for _, s in _FIXUP_WARMUP_STEPS] + [1.0])
        def schedule(step):
            samples = jnp.asarray(step, jnp.float32) * batch_size
            idx = jnp.sum(samples >= thresholds)
            return lr * scales[idx]
    elif tc.lr_schedule == "linear":
        schedule = optax.linear_schedule(0.0, lr, tc.warmup_steps)
    else:
        raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r}")
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.add_decayed_weights(tc.weight_decay, mask=_decay_mask),
        optax.sgd(learning_rate=schedule, momentum=tc.momentum, nesterov=True),
        _scale_output_heads(tc.output_head_lr_scale),
    )


def current_lr(tc: TrainConfig, batch_size: int, step: int) -> float:
    """Host-side view of the scheduled LR at a given step (for metrics
    files; the reference logs p_lr per batch, train.py:641)."""
    lr = tc.learning_rate * (batch_size / tc.batch_scale)
    if tc.lr_schedule == "stepwise":
        return lr * warmup_scale_at(step * batch_size, tc.warmup_samples_scale)
    return lr * min(1.0, step / max(tc.warmup_steps, 1))


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
    batch sharded; XLA inserts the gradient all-reduce over ICI within a
    host and DCN across hosts (the NCCL allreduce of the reference,
    train.py:403). Multi-process (mesh spanning several hosts), each
    process passes shard_batch its OWN rows — batch_size/process_count of
    them, the data its host loaded — and place_state the same replicated
    state on every host."""
    step_fn = make_train_step(model, cfg, tc, batch_size)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    multi = not batch_sharded.is_fully_addressable

    def shard_batch(batch: TrainingBatch) -> TrainingBatch:
        if multi:
            pc = jax.process_count()
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    batch_sharded,
                    np.asarray(x),
                    (np.asarray(x).shape[0] * pc,) + np.asarray(x).shape[1:],
                ),
                batch,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharded), batch
        )

    def place_state(state: TrainState) -> TrainState:
        if multi:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    replicated, np.asarray(x), np.asarray(x).shape
                ),
                state,
            )
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated), state)

    return step_fn, shard_batch, place_state
