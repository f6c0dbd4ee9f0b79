"""KataGo-style conv-ResNet for Coffee, in flax — TPU-first.

Capability parity with the reference model family (`python/model_pytorch.py`,
`python/modelconfigs.py`) re-designed for XLA/TPU:

  * NHWC layout (TPU conv convention), bfloat16 trunk compute with fp32
    params and fp32 heads/softmax.
  * No batch norm: residual branches are gated by a per-block learnable
    scalar initialized to 0 (ReZero), our equivalent of the reference's
    "fixup / fson" normless initialization (`modelconfigs.py` norm_kind
    'fixup'). This keeps the jitted actor and learner graphs identical (no
    train/eval mode split, no running stats to sync across hosts).
  * Block menu: regular pre-activation residual blocks, global-pooling
    blocks (KataGo "regulargpool", `model_pytorch.py:678-747`), and nested
    bottleneck blocks ("bottlenest2", `model_pytorch.py:860-958`).
  * Global pooling = concat(mean, mean·bscale, max) where bscale linearizes
    board size ((sqrt(HW)-14)/10, matching KataGo's KataGPool) so one set of
    weights generalizes across board sizes.
  * Policy head (`model_pytorch.py:1066-1152`) adapted to Coffee's policy
    space: logits per (spot, direction), flattened dir-major to match
    NNPos::xydToPos (`nninputs.cpp:6-8`); NO pass logit (`nninputs.h:16`).
    Output channels: [policy, opponent-reply policy, optimistic policy]
    (the reference's 6 with the two soft-policy channels dropped — they
    address large-board Go data sparsity; can be added later).
  * Value head (`model_pytorch.py:1155-1318`) adapted: win/loss/draw
    3-way logits (the reference keeps KataGo's win/loss pair and asserts on
    draws — `nninputs.cpp:61-68`; Coffee draws are common, so we model them),
    varTimeLeft + shortterm winloss error (squared-softplus, v14 semantics),
    ownership map, future-position maps, and the Coffee-specific
    longest-line-at-end aux target (`trainingwrite.h:193-197` C3) as a
    per-cell classification over run lengths 0..win_len.
    Go-only outputs (scorebelief, scoring, seki) are dropped — N/A for
    Coffee (no scoring; SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    trunk_channels: int
    mid_channels: int
    gpool_channels: int
    blocks: tuple  # tuple of 'regular' | 'gpool' | 'nbt'
    p1_channels: int
    g1_channels: int
    v1_channels: int
    v2_size: int
    num_policy_outputs: int = 3  # policy, opponent, optimistic
    activation: str = "mish"
    # compute dtype for the trunk; heads always run fp32
    dtype: Any = jnp.bfloat16


def _act(name: str):
    if name == "mish":
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    if name == "relu":
        return jax.nn.relu
    if name == "identity":
        return lambda x: x
    raise ValueError(name)


def global_pool(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,3C]: mean, mean*bscale, max (KataGPool semantics)."""
    b, h, w, c = x.shape
    mean = x.mean(axis=(1, 2))
    bscale = (jnp.sqrt(jnp.float32(h * w)) - 14.0) / 10.0
    mx = x.max(axis=(1, 2))
    return jnp.concatenate([mean, mean * bscale.astype(x.dtype), mx], axis=-1)


class Conv(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class BiasAct(nn.Module):
    activation: str = "mish"

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return _act(self.activation)(x + b.astype(x.dtype))


class RegularBlock(nn.Module):
    """Pre-activation residual block with ReZero gate."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, x):
        s = self.spec
        h = BiasAct(s.activation)(x)
        h = Conv(s.mid_channels, 3, s.dtype)(h)
        h = BiasAct(s.activation)(h)
        h = Conv(s.trunk_channels, 3, s.dtype)(h)
        alpha = self.param("alpha", nn.initializers.zeros, (), jnp.float32)
        return x + alpha.astype(x.dtype) * h


class GPoolBlock(nn.Module):
    """Residual block where part of the mid channels are globally pooled and
    fed back as biases to the other part (KataGo regulargpool)."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, x):
        s = self.spec
        h = BiasAct(s.activation)(x)
        hr = Conv(s.mid_channels, 3, s.dtype)(h)
        hg = Conv(s.gpool_channels, 3, s.dtype)(h)
        hg = BiasAct(s.activation)(hg)
        pooled = global_pool(hg)  # [B, 3*gpool]
        bias = nn.Dense(s.mid_channels, use_bias=False, dtype=s.dtype, param_dtype=jnp.float32)(
            pooled
        )
        hr = hr + bias[:, None, None, :]
        hr = BiasAct(s.activation)(hr)
        hr = Conv(s.trunk_channels, 3, s.dtype)(hr)
        alpha = self.param("alpha", nn.initializers.zeros, (), jnp.float32)
        return x + alpha.astype(x.dtype) * hr


class NestedBottleneckBlock(nn.Module):
    """1x1 down -> two inner residual 3x3 blocks -> 1x1 up (bottlenest2)."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, x):
        s = self.spec
        h = BiasAct(s.activation)(x)
        h = Conv(s.mid_channels, 1, s.dtype)(h)
        for _ in range(2):
            hh = BiasAct(s.activation)(h)
            hh = Conv(s.mid_channels, 3, s.dtype)(hh)
            hh = BiasAct(s.activation)(hh)
            hh = Conv(s.mid_channels, 3, s.dtype)(hh)
            inner_alpha = self.param(
                f"alpha_inner_{_}", nn.initializers.zeros, (), jnp.float32
            )
            h = h + inner_alpha.astype(h.dtype) * hh
        h = BiasAct(s.activation)(h)
        h = Conv(s.trunk_channels, 1, s.dtype)(h)
        alpha = self.param("alpha", nn.initializers.zeros, (), jnp.float32)
        return x + alpha.astype(x.dtype) * h


_BLOCKS = {"regular": RegularBlock, "gpool": GPoolBlock, "nbt": NestedBottleneckBlock}


class PolicyHead(nn.Module):
    spec: ModelSpec

    @nn.compact
    def __call__(self, trunk):
        s = self.spec
        # fp32 head
        x = trunk.astype(jnp.float32)
        p = nn.Conv(s.p1_channels, (1, 1), use_bias=False, param_dtype=jnp.float32)(x)
        g = nn.Conv(s.g1_channels, (1, 1), use_bias=False, param_dtype=jnp.float32)(x)
        g = BiasAct(s.activation)(g)
        pooled = global_pool(g)
        p = p + nn.Dense(s.p1_channels, use_bias=False)(pooled)[:, None, None, :]
        p = BiasAct(s.activation)(p)
        # 4 direction planes per policy output channel
        p = nn.Conv(
            s.num_policy_outputs * 4,
            (1, 1),
            use_bias=False,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(0.09, "fan_in", "truncated_normal"),
        )(p)
        b, h, w, _ = p.shape
        # [B,H,W,(n_out,dir)] -> [B, n_out, dir, H, W] -> flat dir-major
        p = p.reshape(b, h, w, s.num_policy_outputs, 4)
        p = jnp.transpose(p, (0, 3, 4, 1, 2))
        return p.reshape(b, s.num_policy_outputs, 4 * h * w)


class ValueHead(nn.Module):
    spec: ModelSpec
    win_len: int

    @nn.compact
    def __call__(self, trunk):
        s = self.spec
        x = trunk.astype(jnp.float32)
        v1 = nn.Conv(s.v1_channels, (1, 1), use_bias=False, param_dtype=jnp.float32)(x)
        v1 = BiasAct(s.activation)(v1)
        pooled = global_pool(v1)  # [B, 3*v1]
        v2 = nn.Dense(s.v2_size)(pooled)
        v2 = _act(s.activation)(v2)

        value_logits = nn.Dense(
            3, kernel_init=nn.initializers.variance_scaling(0.09, "fan_in", "truncated_normal")
        )(v2)  # win/loss/draw of player to move
        # TD value heads: 3 horizons × (win/loss/draw), the reference's
        # miscvaluehead td-value outputs (metrics_pytorch.py loss_td_value)
        td_value_logits = nn.Dense(
            9, kernel_init=nn.initializers.variance_scaling(0.09, "fan_in", "truncated_normal")
        )(v2).reshape(-1, 3, 3)
        misc = nn.Dense(2)(v2)
        # v14 semantics: squared softplus keeps error/variance predictions
        # positive with stable gradients (model_pytorch.py postprocessing)
        var_time_left = jnp.square(jax.nn.softplus(misc[:, 0])) * 2.0
        shortterm_error = jnp.square(jax.nn.softplus(misc[:, 1])) * 0.25

        ownership = nn.Conv(
            1, (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(0.04, "fan_in", "truncated_normal"),
        )(v1)[..., 0]
        futurepos = nn.Conv(
            2, (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(0.04, "fan_in", "truncated_normal"),
        )(x)
        futurepos = jnp.transpose(futurepos, (0, 3, 1, 2))  # [B,2,H,W]
        line_logits = nn.Conv(
            self.win_len + 1, (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(0.04, "fan_in", "truncated_normal"),
        )(v1)
        line_logits = jnp.transpose(line_logits, (0, 3, 1, 2))  # [B,L+1,H,W]
        return {
            "value_logits": value_logits,
            "td_value_logits": td_value_logits,
            "var_time_left": var_time_left,
            "shortterm_error": shortterm_error,
            "ownership": ownership,
            "futurepos": futurepos,
            "line_logits": line_logits,
        }


class CoffeeNet(nn.Module):
    """Full model: inputs are the 18 spatial + 1 global planes from
    `katacoffee_tpu.nn.features` in NCHW (we transpose to NHWC internally).
    """

    spec: ModelSpec
    win_len: int = 4

    @nn.compact
    def __call__(self, spatial, glob):
        s = self.spec
        # [B, C, H, W] -> NHWC, bf16 trunk
        x = jnp.transpose(spatial, (0, 2, 3, 1)).astype(s.dtype)
        x = Conv(s.trunk_channels, 3, s.dtype)(x)
        # inject global input features as channel biases (reference Model
        # linear_ginputs, model_pytorch.py Model.forward)
        gb = nn.Dense(s.trunk_channels, use_bias=False, dtype=s.dtype, param_dtype=jnp.float32)(
            glob.astype(jnp.float32)
        )
        x = x + gb[:, None, None, :].astype(s.dtype)
        for kind in s.blocks:
            x = _BLOCKS[kind](s)(x)
        x = BiasAct(s.activation)(x)

        policy = PolicyHead(s)(x)
        out = ValueHead(s, self.win_len)(x)
        out["policy_logits"] = policy[:, 0]
        out["opponent_policy_logits"] = policy[:, 1]
        out["optimistic_policy_logits"] = policy[:, 2]
        return out


def init_params(model: CoffeeNet, cfg, rng) -> Any:
    from katacoffee_tpu.nn.features import NUM_FEATURES_GLOBAL, NUM_FEATURES_SPATIAL

    spatial = jnp.zeros((1, NUM_FEATURES_SPATIAL, cfg.y_size, cfg.x_size), jnp.float32)
    glob = jnp.zeros((1, NUM_FEATURES_GLOBAL), jnp.float32)
    return model.init(rng, spatial, glob)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
