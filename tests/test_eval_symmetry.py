"""Random-symmetry eval randomization test: transforming features and
inverting the policy must leave legal-mass placement intact, and for a
symmetric position the averaged policy must respect the symmetry."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet, init_params
from katacoffee_tpu.search import make_nn_eval_fn

CFG = GameConfig(5, 5, 4)


def test_randomized_eval_policy_is_legal_and_normalized():
    model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    ev = make_nn_eval_fn(CFG, model, params, symmetry_randomize=True)
    B = 16
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    res = jax.jit(ev)(states, jax.random.PRNGKey(1))
    pol = np.asarray(res.policy)
    legal = np.asarray(jax.vmap(functools.partial(legal_mask_flat, CFG))(states))
    assert (pol[~legal] == 0).all()
    np.testing.assert_allclose(pol.sum(-1), 1.0, rtol=1e-4)
    # different rows drew different symmetries -> policies differ across the
    # batch even though the states are identical
    assert not np.allclose(pol[0], pol[1]) or not np.allclose(pol[0], pol[2])


def test_value_is_symmetry_invariant_choice():
    """Values must not depend on which symmetry was drawn (the empty board
    is fully symmetric, so any systematic difference is a transform bug)."""
    model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    ev = make_nn_eval_fn(CFG, model, params, symmetry_randomize=True)
    B = 32
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    res = jax.jit(ev)(states, jax.random.PRNGKey(2))
    wl = np.asarray(res.wl)
    np.testing.assert_allclose(wl, wl[0], atol=1e-5)
