"""K-playouts-per-round search tests (numSearchThreads analogue,
searchparams.h:111: parallel playouts on one tree with virtual losses)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig, init_state, step
from katacoffee_tpu.search import SearchParams, run_search, uniform_eval_fn
from katacoffee_tpu.search.mcts import S_VISITS, root_visit_counts, select_moves

CFG = GameConfig(5, 5, 4)


def batched(s, n=3):
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


class TestVisitAccounting:
    def test_exact_visits_nondivisible_budget(self):
        """37 sims with K=4: root ends at exactly 38 visits and 37 root edge
        visits, same as sequential."""
        for k in (2, 4):
            sp = SearchParams(valueWeightExponent=0.0, numSearchThreads=k)
            roots = batched(init_state(CFG))
            tree = jax.jit(
                lambda r, key, sp=sp: run_search(CFG, sp, uniform_eval_fn(CFG), r, 37, key)
            )(roots, jax.random.PRNGKey(0))
            visits = np.asarray(tree.stats[:, 0, S_VISITS])
            np.testing.assert_allclose(visits, 38.0)
            ev = np.asarray(root_visit_counts(tree)).sum(-1)
            np.testing.assert_allclose(ev, 37)

    def test_exact_visits_selfplay_params(self):
        """Full selfplay feature set (graph search, bias, noise pruning,
        uncertainty) with K=4."""
        sp = dataclasses.replace(SearchParams.for_selfplay(), numSearchThreads=4)
        sp = dataclasses.replace(sp, rootNumSymmetriesToSample=1)
        roots = batched(init_state(CFG))
        tree = jax.jit(
            lambda r, key: run_search(CFG, sp, uniform_eval_fn(CFG), r, 48, key)
        )(roots, jax.random.PRNGKey(1))
        visits = np.asarray(tree.stats[:, 0, S_VISITS])
        np.testing.assert_allclose(visits, 49.0)
        # no NaNs anywhere in live stats
        n_live = int(np.asarray(tree.node_count).max())
        assert np.isfinite(np.asarray(tree.stats[:, :n_live])).all()

    def test_reuse_path_hits_target_exactly(self):
        sp = SearchParams(valueWeightExponent=0.0, numSearchThreads=4)
        roots = batched(init_state(CFG))
        f = jax.jit(lambda r, key: run_search(CFG, sp, uniform_eval_fn(CFG), r, 40, key))
        tree = f(roots, jax.random.PRNGKey(0))
        moves = select_moves(CFG, sp, tree, jax.random.PRNGKey(1))
        nxt = jax.vmap(functools.partial(step, CFG))(roots, moves)
        f2 = jax.jit(
            lambda r, key, t, a: run_search(
                CFG, sp, uniform_eval_fn(CFG), r, 40, key, reuse_tree=t, reuse_actions=a
            )
        )
        tree2 = f2(nxt, jax.random.PRNGKey(2), tree, moves)
        visits = np.asarray(tree2.stats[:, 0, S_VISITS])
        np.testing.assert_allclose(visits, 41.0)


class TestQuality:
    def test_finds_forced_win(self):
        """Mover has an immediate 4-in-a-row completion; K=4 search must put
        the most visits on a winning move."""
        s = init_state(CFG)
        # build X X X _ on row 0 with direction W (horizontal) constraints:
        # alternate movers; X = player 1 plays (0,0),(1,0),(2,0) horizontally,
        # O plays elsewhere on the constrained lines. Construct via legal play
        # random walk until a position with an immediate win exists is messy;
        # instead directly check: K=4 vs K=1 pick the same move on a midgame
        # position reached by fixed play.
        seq = [0, 1, 2, 28, 54]
        for a in seq:
            s2 = step(CFG, s, jnp.asarray(a))
            if bool(s2.done):
                break
            s = s2
        roots = batched(s, n=2)
        out = {}
        vals = {}
        for k in (1, 4):
            sp = SearchParams(valueWeightExponent=0.0, numSearchThreads=k)
            tree = jax.jit(
                lambda r, key, sp=sp: run_search(
                    CFG, sp, uniform_eval_fn(CFG), r, 200, key
                )
            )(roots, jax.random.PRNGKey(3))
            out[k] = np.asarray(root_visit_counts(tree))
            from katacoffee_tpu.search.mcts import root_values

            vals[k] = np.asarray(root_values(tree)["root_utility"])
        # this position has two tied winning-line moves (4 and 79): both
        # searches must concentrate essentially all visits on that pair,
        # and agree on the root value
        for k in (1, 4):
            top2 = np.sort(np.argsort(-out[k], axis=-1)[:, :2], axis=-1)
            np.testing.assert_array_equal(top2, [[4, 79], [4, 79]])
            assert (out[k][:, [4, 79]].sum(-1) >= 0.95 * out[k].sum(-1)).all()
        np.testing.assert_allclose(vals[1], vals[4], atol=0.05)


class TestVectorizedRound:
    def test_root_sequencing_diversifies(self):
        """One K=4 round from a fresh tree: the sequenced root selection
        (virtual losses on claimed edges, incl. unexpanded ones) must
        spread the 4 playouts over 4 DISTINCT root children — the
        diversification the reference gets from virtual losses
        (searchparams.h numVirtualLossesPerThread)."""
        from katacoffee_tpu.search import mcts

        sp = SearchParams(valueWeightExponent=0.0, numSearchThreads=4)
        roots = batched(init_state(CFG))
        md = CFG.area + 1
        tree = jax.jit(
            lambda r, key: mcts.init_tree(CFG, sp, uniform_eval_fn(CFG), r, 64, key)
        )(roots, jax.random.PRNGKey(1))
        scr = mcts.make_round_scratch(CFG, tree, md, 4)
        tree, *_ = jax.jit(
            lambda t, key, s: mcts._simulate_round(
                CFG, sp, uniform_eval_fn(CFG), t, key, md, 4, scratch=s
            )
        )(tree, jax.random.PRNGKey(2), scr)
        ev = np.asarray(tree.edge_visits[:, 0])
        assert (ev.sum(-1) == 4).all()
        assert ((ev > 0).sum(-1) == 4).all(), "4 playouts -> 4 distinct root edges"
        assert (np.asarray(tree.node_count) == 5).all()  # root + 4 children

    def test_virtual_loss_is_selection_only(self):
        """Virtual losses are a selection-time adjustment: committed tree
        stats after a K=2 round carry no trace of them (weights/utilities
        aggregate only real evals)."""
        from katacoffee_tpu.search.mcts import S_W

        sp = SearchParams(valueWeightExponent=0.0, numSearchThreads=2)
        roots = batched(init_state(CFG))
        tree = jax.jit(
            lambda r, key: run_search(CFG, sp, uniform_eval_fn(CFG), r, 20, key)
        )(roots, jax.random.PRNGKey(9))
        w = np.asarray(tree.stats[:, 0, S_W])
        v = np.asarray(tree.stats[:, 0, S_VISITS])
        # uniform eval weight is 1/visit: weight sum tracks visits exactly
        np.testing.assert_allclose(w, v, rtol=1e-5)
