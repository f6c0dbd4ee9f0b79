"""Precision drift tests — the role of the reference's `testgpuerror`
(cpp/command/gputest.cpp: fp16 vs fp32 NN output drift bounds) for the
bf16-trunk model: the same weights evaluated with a bfloat16 trunk and a
float32 trunk must agree within tight bounds on policy and value."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet, init_params

CFG = GameConfig(5, 5, 4)


def test_bf16_vs_f32_drift_bounds():
    spec16 = get_model_spec("b2c32")
    spec32 = dataclasses.replace(spec16, dtype=jnp.float32)
    m16 = CoffeeNet(spec16, win_len=4)
    m32 = CoffeeNet(spec32, win_len=4)
    params = init_params(m16, CFG, jax.random.PRNGKey(0))

    B = 32
    key = jax.random.PRNGKey(1)
    spatial = jax.random.bernoulli(key, 0.3, (B, 18, 5, 5)).astype(jnp.float32)
    glob = jnp.full((B, 1), 4.0)

    o16 = jax.jit(lambda p, s, g: m16.apply(p, s, g))(params, spatial, glob)
    o32 = jax.jit(lambda p, s, g: m32.apply(p, s, g))(params, spatial, glob)

    p16 = jax.nn.softmax(np.asarray(o16["policy_logits"], np.float32), axis=-1)
    p32 = jax.nn.softmax(np.asarray(o32["policy_logits"], np.float32), axis=-1)
    # policy probabilities: max abs drift bounded (the reference's benchmark
    # considers <~0.02 healthy for fp16)
    assert np.abs(np.asarray(p16) - np.asarray(p32)).max() < 0.05

    v16 = jax.nn.softmax(np.asarray(o16["value_logits"], np.float32), axis=-1)
    v32 = jax.nn.softmax(np.asarray(o32["value_logits"], np.float32), axis=-1)
    assert np.abs(np.asarray(v16) - np.asarray(v32)).max() < 0.05
