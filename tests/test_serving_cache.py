"""Serving-side NN result cache (mcts.NNResultCache) — the NNCacheTable role
(`/root/reference/cpp/neuralnet/nneval.h:18-42`) for GTP/analysis repeated
queries. The in-search path stays uncached by design (in-graph transposition
dedup; docs/DESIGN.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state, jitted
from katacoffee_tpu.search.mcts import NNResultCache, make_cached_raw_forward_fn

CFG = GameConfig(5, 5, 4)


def _states(actions_list):
    """Batch of states, one per action-prefix in actions_list."""
    step = jitted.vstep_fn(CFG)
    sts = []
    for actions in actions_list:
        st = jax.vmap(lambda i: init_state(CFG))(jnp.arange(1))
        for a in actions:
            st = step(st, jnp.asarray([a]))
        sts.append(st)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *sts)


def test_cache_hits_and_exactness():
    calls = []

    def forward(states):
        calls.append(int(states.board.shape[0]))
        # deterministic fake heads derived from the position
        s = jnp.sum(states.board, axis=(1, 2)).astype(jnp.float32)
        return {
            "policy_logits": jnp.tile(s[:, None], (1, 100)),
            "value_logits": jnp.tile(s[:, None], (1, 3)),
        }

    cache = NNResultCache(forward, capacity=8)
    st = _states([[0], [1], [2]])
    out1 = cache(st)
    assert cache.misses == 3 and cache.hits == 0 and calls == [3]
    out2 = cache(st)  # all-hit: no new forward call
    assert calls == [3] and cache.hits == 3
    for k in out1:
        np.testing.assert_array_equal(out1[k], out2[k])

    # same stones, different last move -> distinct key (legality-relevant;
    # constructed directly since Coffee's line constraint fixes move order).
    # The key reads the recent-move ring (slot 0 IS the last move).
    base = _states([[0, 26]])
    ring_a = np.asarray(base.recent_spots).copy()
    ring_b = ring_a.copy()
    ring_a[0, 0], ring_b[0, 0] = 1, 0
    st_a = base._replace(recent_spots=jnp.asarray(ring_a))
    st_b = base._replace(recent_spots=jnp.asarray(ring_b))
    assert np.array_equal(np.asarray(st_a.board), np.asarray(st_b.board))
    cache(st_a)
    n_calls = len(calls)
    cache(st_b)
    assert len(calls) == n_calls + 1, "different last move must miss"

    # same stones + same LAST move, different EARLIER move order -> distinct
    # key: extract_features consumes recent_spots[1..4] as planes 7-10, so a
    # last-move-only key would serve a stale policy (ADVICE r4 medium).
    ring_c, ring_d = ring_a.copy(), ring_a.copy()
    ring_c[0, 1], ring_c[0, 2] = 5, 7
    ring_d[0, 1], ring_d[0, 2] = 7, 5
    st_c = base._replace(recent_spots=jnp.asarray(ring_c))
    st_d = base._replace(recent_spots=jnp.asarray(ring_d))
    cache(st_c)
    n_calls = len(calls)
    cache(st_d)
    assert len(calls) == n_calls + 1, "different history order must miss"


def test_cache_lru_eviction():
    def forward(states):
        return {"x": jnp.zeros((states.board.shape[0], 1))}

    cache = NNResultCache(forward, capacity=2)
    s0, s1, s2 = _states([[0]]), _states([[1]]), _states([[2]])
    cache(s0)
    cache(s1)
    cache(s0)  # refresh s0
    cache(s2)  # evicts s1 (least recent)
    m = cache.misses
    cache(s0)
    assert cache.misses == m  # s0 still cached
    cache(s1)
    assert cache.misses == m + 1  # s1 was evicted


def test_cached_raw_forward_integration():
    """End-to-end over a real tiny CoffeeNet: cached result bit-equal to the
    direct forward, second query is a pure host hit."""
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search.mcts import make_raw_forward_fn

    model = CoffeeNet(get_model_spec("b1c6"), win_len=CFG.win_len)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    direct = make_raw_forward_fn(CFG, model, params)
    cached = make_cached_raw_forward_fn(CFG, model, params)

    st = _states([[3], [7]])
    ref = {k: np.asarray(v) for k, v in direct(st).items()}
    got1 = cached(st)
    got2 = cached(st)
    assert cached.hits == 2 and cached.misses == 2
    for k in ref:
        np.testing.assert_array_equal(ref[k], got1[k])
        np.testing.assert_array_equal(got1[k], got2[k])
