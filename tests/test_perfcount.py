"""Perf-accounting counters (utils/perfcount.py + run_search with_diag).

The diag channel must be a pure observer: enabling it cannot change the
search (bench quality and goldens depend on that), and its counters must
reconcile with the known lockstep structure — fresh searches run exactly
num_sims rounds at occupancy 1; reused searches run max-deficit rounds.
Reference role: the NNEvaluator row/batch counters, nneval.h:171-176.
"""

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, mcts
from katacoffee_tpu.utils import perfcount


def test_with_diag_is_a_pure_observer():
    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_tests_v2()
    ev = mcts.uniform_eval_fn(cfg)
    B, V = 8, 40
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    k = jax.random.PRNGKey(3)
    f0 = jax.jit(lambda s, r: mcts.run_search(cfg, sp, ev, s, V, r, max_nodes=64))
    f1 = jax.jit(
        lambda s, r: mcts.run_search(cfg, sp, ev, s, V, r, max_nodes=64, with_diag=True)
    )
    t0 = f0(states, k)
    t1, diag = f1(states, k)
    for a, b in zip(jax.tree_util.tree_leaves(t0), jax.tree_util.tree_leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(diag["rounds"]) == V
    np.testing.assert_allclose(np.asarray(diag["start_visits"]), 1.0)


def test_search_counters_reconcile():
    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_tests_v2()
    ev = mcts.uniform_eval_fn(cfg)
    c = perfcount.search_counters(
        cfg, sp, ev, init_state, batch_size=8, num_sims=30, moves=4, seed=1
    )
    assert c["rounds_per_move"][0] == 30  # fresh search: one round per sim
    assert c["occupancy_per_move"][0] == 1.0
    # reuse engages: later moves start with reused visits, so rounds can
    # only shrink and delivered visits must cost at most one row each
    assert all(r <= 30 for r in c["rounds_per_move"][1:])
    assert c["visits_per_nn_row"] >= 1.0
    assert c["nn_rows_submitted"] == 8 * sum(c["rounds_per_move"])
    assert all(0.0 < o <= 1.0 for o in c["occupancy_per_move"])
