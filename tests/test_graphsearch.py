"""Graph-search (transposition) tests: node dedup, edge-visit accounting,
catch-up invariants, subtree value bias, and noise pruning — the role of the
reference's runsearchtests v8/v9 graph-search goldens (SURVEY.md §4 tier 2).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.search import (
    SearchParams,
    root_values,
    root_visit_counts,
    run_search,
    uniform_eval_fn,
)

CFG = GameConfig(5, 5, 4)

TREE = SearchParams(valueWeightExponent=0.0, useGraphSearch=False)
GRAPH = SearchParams(valueWeightExponent=0.0, useGraphSearch=True)
FULL = SearchParams.for_tests_v2()  # graph + bias + noise pruning + uncertainty


def batched_roots(cfg, n):
    s = init_state(cfg)
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


@functools.lru_cache(maxsize=None)
def searcher(sp, num_sims, cfg=CFG):
    ev = uniform_eval_fn(cfg)
    return jax.jit(lambda roots, rng: run_search(cfg, sp, ev, roots, num_sims, rng))


# A verified transposition tuple from the empty 5×5 board: black a / white b /
# black c / white d and black c / white b / black a / white d are both legal
# and reach the identical situation (same stones, same last move, same player
# to move). Asserted legal below before use.
TRANS_TUPLE = (31, 30, 34, 33)


def _peaked_eval(cfg, favored):
    """Deterministic eval putting ~all prior on `favored` actions — funnels
    the search down the transposable lines so the graph machinery is actually
    exercised (uniform-prior searches at these visit counts stay too shallow
    for transpositions, which need ≥4 plies with a same-color move swap)."""
    from katacoffee_tpu.game.board import legal_mask_flat as lmf
    from katacoffee_tpu.search.mcts import EvalResult

    fav = jnp.zeros((cfg.policy_size,), jnp.float32).at[jnp.asarray(list(favored))].set(1.0)

    def fn(states, rng):
        legal = jax.vmap(functools.partial(lmf, cfg))(states)
        w = jnp.where(legal, jnp.where(fav[None, :] > 0, 1000.0, 1.0), 0.0)
        policy = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-9)
        z = jnp.zeros((policy.shape[0],), jnp.float32)
        return EvalResult(policy=policy, utility=z, wl=z, draw=z,
                          shortterm_error=jnp.full((policy.shape[0],), 0.5))

    return fn


class TestGraphSearch:
    def _assert_transposition_tuple_legal(self):
        from katacoffee_tpu.game.board import legal_mask_flat, step

        a, b, c, d = TRANS_TUPLE
        import itertools

        hashes = []
        for seq in ((a, b, c, d), (c, b, a, d)):
            s = init_state(CFG)
            for mv in seq:
                assert bool(legal_mask_flat(CFG, s)[mv]), (seq, mv)
                s = step(CFG, s, jnp.asarray(mv, jnp.int32))
            from katacoffee_tpu.game.board import situation_hash

            hashes.append(np.asarray(situation_hash(CFG, s)))
        np.testing.assert_array_equal(hashes[0], hashes[1])

    def test_dedup_reduces_nodes(self):
        """Both orders of the transposition tuple must merge into one graph
        node: graph mode allocates strictly fewer nodes than tree mode."""
        self._assert_transposition_tuple_legal()
        ev = _peaked_eval(CFG, TRANS_TUPLE)
        roots = batched_roots(CFG, 2)
        run = lambda sp: jax.jit(
            lambda r, k: run_search(CFG, sp, ev, r, 100, k)
        )(roots, jax.random.PRNGKey(0))
        n_tree = np.asarray(run(TREE).node_count)
        n_graph = np.asarray(run(GRAPH).node_count)
        assert (n_graph < n_tree).all(), (n_tree, n_graph)

    def test_transposed_children_shared(self):
        """At least one node index must be the target of 2+ live edges."""
        ev = _peaked_eval(CFG, TRANS_TUPLE)
        roots = batched_roots(CFG, 1)
        tree = jax.jit(lambda r, k: run_search(CFG, GRAPH, ev, r, 100, k))(
            roots, jax.random.PRNGKey(1)
        )
        children = np.asarray(tree.children[0])
        evis = np.asarray(tree.edge_visits[0])
        targets = children[(children >= 0) & (evis > 0)]
        _, counts = np.unique(targets, return_counts=True)
        assert (counts >= 2).any()

    def test_edge_visits_bounded_by_child_visits(self):
        """Catch-up invariant (search.cpp:1199): an edge never exceeds its
        child's own visits."""
        roots = batched_roots(CFG, 4)
        tree = searcher(GRAPH, 200)(roots, jax.random.PRNGKey(2))
        children = np.asarray(tree.children)  # [B, N, A]
        evis = np.asarray(tree.edge_visits)
        visits = np.asarray(tree.visits)  # [B, N]
        B = children.shape[0]
        for b in range(B):
            has = children[b] >= 0
            cv = visits[b][np.maximum(children[b], 0)]
            assert (evis[b][has] <= cv[has]).all()

    def test_root_visit_conservation_graph_mode(self):
        roots = batched_roots(CFG, 4)
        num_sims = 120
        tree = searcher(GRAPH, num_sims)(roots, jax.random.PRNGKey(3))
        rv = np.asarray(root_visit_counts(tree))
        np.testing.assert_array_equal(rv.sum(-1), num_sims)
        np.testing.assert_array_equal(np.asarray(tree.visits[:, 0]), 1 + num_sims)

    def test_values_sane_full_profile(self):
        roots = batched_roots(CFG, 4)
        tree = searcher(FULL, 150)(roots, jax.random.PRNGKey(4))
        vals = root_values(tree)
        for k in ("root_utility", "root_wl", "root_draw"):
            v = np.asarray(vals[k])
            assert np.isfinite(v).all(), k
            assert (np.abs(v) <= 1.0 + 1e-4).all(), (k, v)
        w = np.asarray(tree.weight_sum)
        assert (w >= 0).all() and np.isfinite(w).all()

    def test_bias_table_populated(self):
        sp = dataclasses.replace(GRAPH, subtreeValueBiasFactor=0.3,
                                 subtreeValueBiasWeightExponent=0.8)
        roots = batched_roots(CFG, 2)
        tree = searcher(sp, 150)(roots, jax.random.PRNGKey(5))
        table = np.asarray(tree.bias_table)
        assert table.shape[1] > 1
        assert (table[:, :, 1] > 0).any()  # weight entries accumulated
        assert np.isfinite(table).all()

    def test_bias_off_table_is_dummy(self):
        roots = batched_roots(CFG, 2)
        tree = searcher(GRAPH, 20)(roots, jax.random.PRNGKey(6))
        assert tree.bias_table.shape[1] == 1

    def test_noise_pruning_runs_and_conserves(self):
        sp = dataclasses.replace(TREE, useNoisePruning=True, valueWeightExponent=0.25)
        roots = batched_roots(CFG, 4)
        tree = searcher(sp, 100)(roots, jax.random.PRNGKey(7))
        rv = np.asarray(root_visit_counts(tree))
        np.testing.assert_array_equal(rv.sum(-1), 100)
        assert np.isfinite(np.asarray(tree.utility_avg)).all()

    def test_graph_finds_immediate_win(self):
        """The tactical requirement must survive the full profile: a position
        with a winning move should funnel most visits into it."""
        import random

        from tests.oracle import OracleGame

        rnd = random.Random(11)
        while True:
            g = OracleGame()
            while not g.done:
                wins = [
                    (x, y, d)
                    for (x, y, d) in g.legal_moves()
                    if g.move_wins(x, y, d)
                ] if hasattr(g, "move_wins") else []
                x, y, d = rnd.choice(g.legal_moves())
                g.play(x, y, d)
            if g.winner != 0 and len(g.history) >= 8:
                break
        # replay to just before the winning move
        moves = g.history[:-1]
        wx, wy, wd, _ = g.history[-1]
        s = init_state(CFG)
        for x, y, d, _pla in moves:
            s = jax.jit(functools.partial(__import__("katacoffee_tpu.game.board", fromlist=["step"]).step, CFG))(
                s, jnp.asarray(d * 25 + y * 5 + x, jnp.int32)
            )
        roots = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), s)
        tree = searcher(FULL, 120)(roots, jax.random.PRNGKey(8))
        rv = np.asarray(root_visit_counts(tree))[0]
        # the position may admit several winning moves; the most-visited move
        # must be one of them and dominate the search
        g2 = OracleGame()
        for x, y, d, _pla in moves:
            g2.play(x, y, d)
        top = int(np.argmax(rv))
        tx, ty, td = top % 25 % 5, top % 25 // 5, top // 25
        assert g2.is_legal(tx, ty, td)
        g2.play(tx, ty, td)
        assert g2.done and g2.winner == g2.history[-1][3]
        assert rv[top] > 0.3 * rv.sum()
