"""avoidMoveUntilByLoc depth-gating tests.

The reference restricts moves per player until a given descent depth
(searchexplorehelpers.cpp:395-421), built from analysis-engine
avoidMoves/allowMoves entries (analysis.cpp:1030-1091) or GTP avoid/allow
args (gtp.cpp:1591-1686). Here the same semantics ride `avoid_until`
[B,2,A] int32 through run_search: action a is excluded for player p at
depth d while avoid_until[p-1, a] > d (depth 0 = root)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.command.analysis import AnalysisEngine
from katacoffee_tpu.command.gtp import GTPEngine
from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, run_search, uniform_eval_fn

CFG = GameConfig(5, 5, 4)
Y = 12  # "C3 N": direction 0, row 2, col 2 — legal from the initial position
VISITS = 600


@functools.lru_cache(maxsize=None)
def _searcher():
    ev = uniform_eval_fn(CFG)
    sp = SearchParams.for_tests_v2()
    return jax.jit(
        lambda roots, rng, au: run_search(CFG, sp, ev, roots, VISITS, rng, avoid_until=au)
    )


def _search(until_white_y: int):
    roots = jax.tree_util.tree_map(lambda x: x[None], init_state(CFG))
    au = np.zeros((1, 2, CFG.policy_size), np.int32)
    au[0, 1, Y] = until_white_y  # restriction on WHITE's use of Y
    tree = _searcher()(roots, jax.random.PRNGKey(7), jnp.asarray(au))
    return tree


def _white_depth1_edge_visits_on_y(tree) -> int:
    """Total edge visits of action Y from live white-to-move nodes one ply
    below the root (white first moves at depth 1; black holds the root)."""
    visits = np.asarray(tree.visits[0])
    to_move = np.asarray(tree.states.to_move[0])
    turns = np.asarray(tree.states.num_turns[0])
    ev = np.asarray(tree.edge_visits[0])
    mask = (visits > 0) & (to_move == 2) & (turns == 1)
    return int(ev[mask, Y].sum())


def test_until_depth_gates_descent():
    # unrestricted: white depth-1 nodes do search Y (the test has teeth)
    base = _search(0)
    assert _white_depth1_edge_visits_on_y(base) > 0
    # untilDepth=3 forbids Y for white at depths 0-2, so depth-1 white
    # nodes must never take it
    gated = _search(3)
    assert _white_depth1_edge_visits_on_y(gated) == 0
    # untilDepth=1 only covers depth 0, where white never moves: no effect
    root_only = _search(1)
    assert _white_depth1_edge_visits_on_y(root_only) > 0
    # the restriction must not change the total work done
    assert int(np.asarray(gated.visits[0, 0])) >= VISITS


# ---------------------------------------------------------------------------
# Frontend parsing
# ---------------------------------------------------------------------------


def _gtp():
    return GTPEngine(CFG, SearchParams(valueWeightExponent=0.0), max_visits=8, seed=0)


def test_gtp_avoid_allow_build_until_arrays():
    g = _gtp()
    spec = g._parse_analyze_args(["b", "avoid", "b", "C3N,C3W", "2", "avoid", "w", "A1NE", "5"])
    au = spec["avoid_until"]
    assert au is not None and au.shape == (2, CFG.policy_size)
    assert au[0, Y] == 2  # black C3 N
    assert au[0].sum() == 4  # C3 N + C3 W only
    assert au[1].sum() == 5  # white A1 NE at depth 5
    # the root mover (black) depth-0 restriction doubles as the root mask
    assert spec["avoid"][Y] and spec["avoid"].sum() == 2


def test_gtp_allow_fills_complement():
    g = _gtp()
    spec = g._parse_analyze_args(["b", "allow", "b", "C3N", "3"])
    au = spec["avoid_until"]
    assert au[0, Y] == 0
    assert (au[0][np.arange(CFG.policy_size) != Y] == 3).all()
    assert au[1].sum() == 0
    assert not spec["avoid"][Y] and spec["avoid"].sum() == CFG.policy_size - 1


def test_gtp_rejects_mixed_avoid_allow():
    g = _gtp()
    with pytest.raises(ValueError):
        g._parse_analyze_args(["b", "avoid", "b", "C3N", "1", "allow", "b", "C3W", "1"])
    with pytest.raises(ValueError):
        g._parse_analyze_args(["b", "allow", "b", "C3N", "1", "allow", "b", "C3W", "1"])
    with pytest.raises(ValueError):
        g._parse_analyze_args(["b", "avoid", "b", "C3N", "0"])
    # distinct players may each carry their own restriction kind
    spec = g._parse_analyze_args(["b", "allow", "b", "C3N", "1", "avoid", "w", "C3W", "1"])
    assert spec["avoid_until"] is not None


def test_analysis_engine_restriction_errors():
    eng = AnalysisEngine(SearchParams(valueWeightExponent=0.0), default_visits=4)
    base = {"id": "q", "boardXSize": 5, "boardYSize": 5, "maxVisits": 4}
    both = dict(base, avoidMoves=[{"player": "B", "moves": ["C3 N"], "untilDepth": 1}],
                allowMoves=[{"player": "B", "moves": ["C3 W"], "untilDepth": 1}])
    (r,) = eng.handle_query(both)
    assert "error" in r and "both" in r["error"]
    two_allows = dict(base, allowMoves=[
        {"player": "B", "moves": ["C3 N"], "untilDepth": 1},
        {"player": "W", "moves": ["C3 W"], "untilDepth": 1},
    ])
    (r,) = eng.handle_query(two_allows)
    assert "error" in r and "one entry" in r["error"]
    bad_depth = dict(base, avoidMoves=[{"player": "B", "moves": ["C3 N"], "untilDepth": 0}])
    (r,) = eng.handle_query(bad_depth)
    assert "error" in r and "positive" in r["error"]


def test_analysis_engine_builds_until_rows():
    eng = AnalysisEngine(SearchParams(valueWeightExponent=0.0), default_visits=4)
    q = {
        "id": "q", "boardXSize": 5, "boardYSize": 5, "maxVisits": 4,
        "avoidMoves": [
            {"player": "B", "moves": ["C3 N"], "untilDepth": 4},
            {"player": "W", "moves": ["C3 W", "A1 NE"], "untilDepth": 2},
        ],
    }
    prep = eng._prepare(q)
    au = prep["avoid_until"]
    assert au.shape == (1, 2, CFG.policy_size)
    assert au[0, 0, Y] == 4 and au[0, 0].sum() == 4
    assert au[0, 1].sum() == 4  # two white moves at depth 2
    # black is the mover at turn 0: the root mask is black's depth-0 row
    assert prep["avoid"][0, Y] and prep["avoid"][0].sum() == 1
