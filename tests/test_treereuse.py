"""Tree reuse tests (the reference's beginSearch reuse, search.cpp:262-331):
re-rooting preserves the played child's subtree, reused visits count toward
the visit budget, and invalid reuse falls back to a fresh root."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.game.board import step
from katacoffee_tpu.search import (
    SearchParams,
    root_visit_counts,
    run_search,
    uniform_eval_fn,
)
from katacoffee_tpu.search.mcts import advance_root

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0, useGraphSearch=False)
SP_BIAS = SearchParams.for_selfplay()


def batched_roots(cfg, n):
    s = init_state(cfg)
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


def first_search(sp, num_sims, roots, seed=0):
    ev = uniform_eval_fn(CFG)
    return jax.jit(lambda r, k: run_search(CFG, sp, ev, r, num_sims, k))(
        roots, jax.random.PRNGKey(seed)
    )


class TestAdvanceRoot:
    def test_root_is_played_child(self):
        B, sims = 4, 60
        roots = batched_roots(CFG, B)
        tree = first_search(SP, sims, roots)
        rv = np.asarray(root_visit_counts(tree))
        actions = jnp.asarray(np.argmax(rv, -1))
        bidx = np.arange(B)
        old_child = np.asarray(tree.children[:, 0, :])[bidx, np.asarray(actions)]
        old_visits = np.asarray(tree.visits)[bidx, old_child]
        old_util = np.asarray(tree.utility_avg)[bidx, old_child]

        next_states = jax.vmap(functools.partial(step, CFG))(
            jax.tree_util.tree_map(lambda x: x[:, 0], tree.states), actions
        )
        ev = uniform_eval_fn(CFG)
        adv = jax.jit(
            lambda t, a, s, k: advance_root(
                CFG, SP, ev, t, a, s, k, reuse_ok=jnp.ones((B,), bool)
            )
        )(tree, actions, next_states, jax.random.PRNGKey(1))

        np.testing.assert_array_equal(np.asarray(adv.visits[:, 0]), old_visits)
        np.testing.assert_allclose(np.asarray(adv.utility_avg[:, 0]), old_util, rtol=1e-6)
        # the new root's stored state is the post-move position
        np.testing.assert_array_equal(
            np.asarray(adv.states.board[:, 0]), np.asarray(next_states.board)
        )
        # node budget shrank to the kept subtree
        assert (np.asarray(adv.node_count) <= np.asarray(tree.node_count)).all()
        assert (np.asarray(adv.node_count) >= old_visits).all()
        # children pointers stay in-range and consistent
        ch = np.asarray(adv.children)
        nc = np.asarray(adv.node_count)
        for b in range(B):
            assert ch[b][ch[b] >= 0].max(initial=0) < nc[b]

    def test_reuse_counts_toward_budget(self):
        """run_search with a reused tree must stop at num_sims+1 root visits,
        i.e. reused visits are not re-searched (the compute saving)."""
        B, sims = 4, 80
        roots = batched_roots(CFG, B)
        tree = first_search(SP, sims, roots)
        rv = np.asarray(root_visit_counts(tree))
        actions = jnp.asarray(np.argmax(rv, -1))
        next_states = jax.vmap(functools.partial(step, CFG))(
            jax.tree_util.tree_map(lambda x: x[:, 0], tree.states), actions
        )
        ev = uniform_eval_fn(CFG)
        tree2 = jax.jit(
            lambda r, k, t, a: run_search(
                CFG, SP, ev, r, sims, k,
                reuse_tree=t, reuse_actions=a, reuse_ok=jnp.ones((B,), bool),
            )
        )(next_states, jax.random.PRNGKey(2), tree, actions)
        rv2 = np.asarray(tree2.visits[:, 0])
        np.testing.assert_array_equal(rv2, sims + 1)
        # and fewer nodes were allocated than a fresh search would need
        assert (np.asarray(tree2.node_count) <= sims + 2).all()

    def test_reuse_ok_false_gives_fresh_root(self):
        B, sims = 2, 40
        roots = batched_roots(CFG, B)
        tree = first_search(SP, sims, roots)
        actions = jnp.zeros((B,), jnp.int32)
        fresh_states = batched_roots(CFG, B)  # pretend the games reset
        ev = uniform_eval_fn(CFG)
        adv = jax.jit(
            lambda t, a, s, k: advance_root(
                CFG, SP, ev, t, a, s, k, reuse_ok=jnp.zeros((B,), bool)
            )
        )(tree, actions, fresh_states, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(adv.node_count), 1)
        np.testing.assert_array_equal(np.asarray(adv.visits[:, 0]), 1)
        np.testing.assert_array_equal(
            np.asarray(adv.states.board[:, 0]), np.asarray(fresh_states.board)
        )

    def test_full_profile_reuse_runs(self):
        """Graph search + bias + pruning + uncertainty with reuse: values
        stay finite over several consecutive reused searches."""
        B, sims = 4, 50
        ev = uniform_eval_fn(CFG)
        roots = batched_roots(CFG, B)
        search0 = jax.jit(lambda r, k: run_search(CFG, SP_BIAS, ev, r, sims, k))
        searchR = jax.jit(
            lambda r, k, t, a, ok: run_search(
                CFG, SP_BIAS, ev, r, sims, k,
                reuse_tree=t, reuse_actions=a, reuse_ok=ok,
            )
        )
        from katacoffee_tpu.search import select_moves

        key = jax.random.PRNGKey(4)
        tree = search0(roots, key)
        states = roots
        for i in range(4):
            key, k1, k2 = jax.random.split(key, 3)
            actions = select_moves(CFG, SP_BIAS, tree, k1)
            states = jax.vmap(functools.partial(step, CFG))(
                jax.tree_util.tree_map(lambda x: x[:, 0], tree.states), actions
            )
            ok = ~states.done
            tree = searchR(states, k2, tree, actions, ok)
            u = np.asarray(tree.utility_avg)
            assert np.isfinite(u).all()
            assert (np.abs(np.asarray(tree.utility_avg[:, 0])) <= 1.5).all()
            live = np.asarray(~states.done)
            np.testing.assert_array_equal(
                np.asarray(tree.visits[:, 0])[live], sims + 1
            )
