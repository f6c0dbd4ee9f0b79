"""policyOptimism / rootPolicyOptimism (searchparams.h:30, setup.cpp:507-512,
653-659): the search blends the evaluator's raw and optimistic policies
geometrically, with a SEPARATE knob at the root vs in-tree nodes — the
reference gatekeeper/match op point runs policyOptimism=1.0 with
rootPolicyOptimism=0.0 (cpp/configs/training/gatekeeper1.cfg:100-101).

Also pins the batched-match diversity property that motivated the
for_match()/for_gatekeeper() profiles: with nonzero move temperature, the
games of a same-color half must NOT all be identical (a zero-temperature
round-robin between deterministic bots produces degenerate 30-0-30 blocks
and a garbage Elo fit).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, mcts


CFG = GameConfig(5, 5, 4)
A = CFG.policy_size


def _two_policy_eval(cfg):
    """Eval fn whose raw policy is uniform over legal moves and whose
    optimistic policy is sharply peaked on the first legal move."""
    from katacoffee_tpu.game.board import legal_mask_flat
    import functools

    def fn(states, rng):
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)
        cnt = jnp.maximum(legal.sum(-1, keepdims=True), 1)
        plain = legal.astype(jnp.float32) / cnt
        first = jnp.argmax(legal, axis=-1)
        peak = jax.nn.one_hot(first, legal.shape[-1]) * 0.9 + plain * 0.1
        peak = jnp.where(legal, peak, 0.0)
        peak = peak / jnp.maximum(peak.sum(-1, keepdims=True), 1e-9)
        b = plain.shape[0]
        return mcts.EvalResult(
            policy=plain,
            utility=jnp.zeros((b,)),
            wl=jnp.zeros((b,)),
            draw=jnp.zeros((b,)),
            shortterm_error=jnp.full((b,), 0.5),
            policy_opt=peak,
        )

    return fn


def _base_sp(**kw):
    return dataclasses.replace(
        SearchParams(),
        rootNoiseEnabled=False,
        rootPolicyTemperature=1.0,
        rootPolicyTemperatureEarly=1.0,
        **kw,
    )


def test_root_optimism_blends_root_prior():
    eval_fn = _two_policy_eval(CFG)
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(2))
    rng = jax.random.PRNGKey(0)

    t_plain = mcts.init_tree(CFG, _base_sp(), eval_fn, states, 8, rng)
    t_opt = mcts.init_tree(
        CFG, _base_sp(rootPolicyOptimism=1.0), eval_fn, states, 8, rng
    )
    res = eval_fn(states, rng)
    legal = np.asarray(res.policy[0]) > 0
    np.testing.assert_allclose(
        np.asarray(t_plain.root_prior[0])[legal], np.asarray(res.policy[0])[legal],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(t_opt.root_prior[0])[legal], np.asarray(res.policy_opt[0])[legal],
        rtol=1e-5,
    )
    # half-blend is the normalized geometric mean, strictly between the two
    t_half = mcts.init_tree(
        CFG, _base_sp(rootPolicyOptimism=0.5), eval_fn, states, 8, rng
    )
    half = np.asarray(t_half.root_prior[0])[legal]
    geo = np.sqrt(np.asarray(res.policy[0])[legal] * np.asarray(res.policy_opt[0])[legal])
    geo = geo / geo.sum()
    np.testing.assert_allclose(half, geo, rtol=1e-5)


def test_tree_optimism_blends_child_priors_not_root():
    """gatekeeper op point: root keeps the raw policy, expanded children
    store the optimistic policy."""
    eval_fn = _two_policy_eval(CFG)
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(2))
    rng = jax.random.PRNGKey(1)
    sp = _base_sp(policyOptimism=1.0, rootPolicyOptimism=0.0)

    tree = mcts.run_search(CFG, sp, eval_fn, states, 8, rng)
    res = eval_fn(states, rng)
    legal = np.asarray(res.policy[0]) > 0
    # root prior untouched (rootPolicyOptimism=0)
    np.testing.assert_allclose(
        np.asarray(tree.root_prior[0])[legal], np.asarray(res.policy[0])[legal],
        rtol=1e-5,
    )
    # an expanded (non-root, non-terminal) child stores a peaked prior:
    # max prior ~0.9+, far above uniform 1/num_legal
    prior = np.asarray(tree.prior)  # [B, N, A]
    count = int(tree.node_count[0])
    found_peaked = False
    for n in range(1, count):
        row = prior[0, n]
        if (row >= 0).any() and not bool(tree.is_terminal[0, n]):
            if row.max() > 0.5:
                found_peaked = True
    assert found_peaked, "no expanded child carries the optimistic prior"


def test_match_profile_produces_diverse_games():
    """for_match(): same-color games of identical bots must diverge (the
    early-move temperature), so pairings don't yield degenerate uniform
    blocks."""
    from katacoffee_tpu.program.match import run_match

    sp = SearchParams.for_match()
    eval_fn = mcts.uniform_eval_fn(CFG)
    result = run_match(
        CFG, sp, sp, eval_fn, eval_fn, num_games=8, num_visits=20, seed=5,
        record_moves=True,
    )
    half = result.games // 2
    firsts = [tuple(m[:6]) for m in result.move_records[:half]]
    assert len(set(firsts)) > 1, f"same-color games identical: {firsts}"


def test_gatekeeper_profile_mirrors_reference_config():
    """Spot-check for_gatekeeper() against gatekeeper1.cfg values."""
    sp = SearchParams.for_gatekeeper()
    assert sp.chosenMoveTemperature == pytest.approx(0.2)
    assert sp.chosenMoveTemperatureEarly == pytest.approx(0.5)
    assert sp.policyOptimism == pytest.approx(1.0)
    assert sp.rootPolicyOptimism == pytest.approx(0.0)
    assert sp.subtreeValueBiasFactor == pytest.approx(0.35)
    assert sp.rootFpuReductionMax == pytest.approx(0.1)
    assert sp.useUncertainty and sp.useGraphSearch and sp.useLcbForSelection
    assert not sp.rootNoiseEnabled
    m = SearchParams.for_match()
    assert m.chosenMoveTemperatureEarly == pytest.approx(0.60)
