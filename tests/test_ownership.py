"""Tree-averaged ownership (search/ownership.py) — the reference's
getAverageTreeOwnership / traverseTreeForOwnership
(cpp/search/searchresults.cpp:1566-1745) recomputed from the packed tree
arrays. Tier-1: the proportion recursion checked against hand-derived
values on constructed trees; integration: analysis-engine and GTP
kata-analyze surfaces."""

import io

import numpy as np
import pytest

from katacoffee_tpu.search.ownership import ownership_props


def _mk(n, a=2):
    children = np.full((n, a), -1, np.int32)
    edge_visits = np.zeros((n, a), np.int32)
    visits = np.zeros(n, np.int64)
    weight_sum = np.zeros(n, np.float64)
    self_weight = np.ones(n, np.float64)
    is_terminal = np.zeros(n, bool)
    return children, edge_visits, visits, weight_sum, self_weight, is_terminal


def test_leaf_only():
    arrs = _mk(1)
    arrs[2][0] = 1  # visits
    props = ownership_props(*arrs)
    assert props[0] == pytest.approx(1.0)


def test_two_level_hand_computed():
    """Root with two children; hand-derive the reference formulas:
    childWeight_i = weightSum_i * edge/childVisits; root keeps
    selfW/(cwSum+selfW); children split the rest by cw^2."""
    ch, ev, vis, ws, sw, term = _mk(3)
    ch[0, 0], ch[0, 1] = 1, 2
    ev[0, 0], ev[0, 1] = 6, 3
    vis[:] = [10, 6, 3]
    ws[:] = [10.0, 6.0, 3.0]
    sw[:] = [1.0, 1.0, 1.0]
    props = ownership_props(ch, ev, vis, ws, sw, term)
    cw1, cw2 = 6.0, 3.0  # weightSum * edge/visits = full weights here
    cw_sum, rel = cw1 + cw2, cw1**2 + cw2**2
    root_self = 1.0 / (cw_sum + 1.0)
    from_children = cw_sum / (cw_sum + 1.0)
    d1 = cw1**2 / rel * from_children
    d2 = cw2**2 / rel * from_children
    # both children are themselves leaves -> they keep their full share
    assert props[0] == pytest.approx(root_self)
    assert props[1] == pytest.approx(d1)
    assert props[2] == pytest.approx(d2)
    assert props.sum() == pytest.approx(1.0)


def test_terminal_child_returns_prop_to_parent():
    """A terminal child has no NN map (the reference's nnOutput==NULL path,
    searchresults.cpp:1627-1630): its proportion folds back into the
    parent's own map."""
    ch, ev, vis, ws, sw, term = _mk(2)
    ch[0, 0] = 1
    ev[0, 0] = 5
    vis[:] = [6, 5]
    ws[:] = [6.0, 5.0]
    term[1] = True
    props = ownership_props(ch, ev, vis, ws, sw, term)
    assert props[0] == pytest.approx(1.0)
    assert props[1] == 0.0


def test_min_prop_cutoff_stops_descent():
    """Nodes whose desiredProp falls below 0.5/visits^0.75 accumulate at
    that depth rather than recursing (searchresults.cpp:1578-1581)."""
    # a deep chain with a huge root visit count -> min_prop small, but make
    # a tiny-weight side child whose share is below prune_prop -> absorbed
    ch, ev, vis, ws, sw, term = _mk(3)
    ch[0, 0], ch[0, 1] = 1, 2
    ev[0, 0], ev[0, 1] = 10000, 1
    vis[:] = [10001, 10000, 1]
    ws[:] = [10001.0, 10000.0, 1e-7]
    props = ownership_props(ch, ev, vis, ws, sw, term)
    # side child's share ~ (1e-7)^2/rel -> far below pruneProp: dropped into
    # the root's own proportion; everything still sums to 1
    assert props[2] == 0.0
    assert props.sum() == pytest.approx(1.0)


def test_edge_scaling_under_transposition():
    """childWeight uses edgeVisits/childVisits scaling (searchnode.h:59-64):
    a transposed child visited mostly through another path contributes
    proportionally to THIS edge's visits."""
    ch, ev, vis, ws, sw, term = _mk(3)
    ch[0, 0], ch[0, 1] = 1, 2
    ev[0, 0], ev[0, 1] = 2, 4
    vis[:] = [6, 8, 4]  # child 1 has 8 visits but only 2 through this edge
    ws[:] = [6.0, 8.0, 4.0]
    props = ownership_props(ch, ev, vis, ws, sw, term)
    cw1 = 8.0 * 2 / 8  # = 2
    cw2 = 4.0 * 4 / 4  # = 4
    rel = cw1**2 + cw2**2
    from_children = (cw1 + cw2) / (cw1 + cw2 + 1.0)
    assert props[1] == pytest.approx(cw1**2 / rel * from_children)
    assert props[2] == pytest.approx(cw2**2 / rel * from_children)


# ---------------------------------------------------------------------------
# integration: protocol surfaces
# ---------------------------------------------------------------------------


def _model_engine():
    import jax

    from katacoffee_tpu.command.analysis import AnalysisEngine
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import (
        SearchParams,
        make_nn_eval_fn,
        make_raw_forward_fn,
    )

    CFG = GameConfig(5, 5, 4)
    model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    return AnalysisEngine(
        SearchParams(valueWeightExponent=0.0),
        eval_fn_factory=lambda cfg: make_nn_eval_fn(cfg, model, params),
        raw_forward_factory=lambda cfg: make_raw_forward_fn(cfg, model, params),
        default_visits=8,
    )


def test_analysis_ownership_options():
    eng = _model_engine()
    res = eng.handle_query(
        {
            "id": "o",
            "moves": [["B", "C3 N"]],
            "maxVisits": 12,
            "includeOwnership": True,
            "includeOwnershipStdev": True,
            "includeMovesOwnership": True,
            "includeMovesOwnershipStdev": True,
        }
    )[0]
    assert len(res["ownership"]) == 25
    assert len(res["ownershipStdev"]) == 25
    assert all(v >= 0.0 for v in res["ownershipStdev"])
    for mi in res["moveInfos"]:
        assert len(mi["ownership"]) == 25
        assert len(mi["ownershipStdev"]) == 25
        assert "weight" in mi and "utilityLcb" in mi
    ri = res["rootInfo"]
    for k in ("weight", "thisHash", "symHash", "rawStWrError", "rawVarTimeLeft"):
        assert k in ri, k
    # symHash is the orbit minimum, so it is <= thisHash as a hex string
    assert ri["symHash"] <= ri["thisHash"]


def test_analysis_override_settings_and_pvlen():
    eng = _model_engine()
    res = eng.handle_query(
        {
            "id": "q",
            "maxVisits": 16,
            "analysisPVLen": 1,
            "overrideSettings": {"rootNoiseEnabled": True, "cpuctExploration": 0.5},
        }
    )[0]
    assert all(len(mi["pv"]) <= 1 for mi in res["moveInfos"])
    bad = eng.handle_query(
        {"id": "q2", "maxVisits": 8, "overrideSettings": {"noSuchParam": 1}}
    )
    assert "error" in bad[0]
    # top-level shorthands are accepted
    res3 = eng.handle_query(
        {"id": "q3", "maxVisits": 8, "rootPolicyTemperature": 1.4,
         "rootFpuReductionMax": 0.0}
    )[0]
    assert res3["moveInfos"]


def test_gtp_moves_ownership():
    import jax

    from katacoffee_tpu.command.gtp import GTPEngine
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import (
        SearchParams,
        make_nn_eval_fn,
        make_raw_forward_fn,
    )

    CFG = GameConfig(5, 5, 4)
    model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    g = GTPEngine(
        CFG,
        SearchParams(valueWeightExponent=0.0),
        eval_fn=make_nn_eval_fn(CFG, model, params),
        raw_fwd=make_raw_forward_fn(CFG, model, params),
        max_visits=10,
    )
    resp, _ = g.handle(
        "kata-analyze b maxmoves 2 ownership true ownershipStdev true "
        "movesOwnership true"
    )
    assert " ownership " in resp
    assert " ownershipStdev " in resp
    assert " movesOwnership " in resp
    assert " weight " in resp and " utilityLcb " in resp
    own_vals = resp.split(" ownership ")[-1].split(" ownershipStdev ")[0].split()
    assert len(own_vals) == 25


# ---------------------------------------------------------------------------
# analysis scheduling: priority ordering + terminate (Analysis_Engine.md)
# ---------------------------------------------------------------------------


def _run_lines(lines):
    import json

    from katacoffee_tpu.command.analysis import AnalysisEngine
    from katacoffee_tpu.search import SearchParams

    eng = AnalysisEngine(SearchParams(valueWeightExponent=0.0), default_visits=8)
    out = io.StringIO()
    eng.run(io.StringIO("\n".join(lines) + "\n"), out)
    return [json.loads(l) for l in out.getvalue().splitlines()]


def test_priority_orders_pending_queries():
    res = _run_lines([
        '{"id":"low","maxVisits":4}',
        '{"id":"high","maxVisits":4,"priority":5}',
        '{"id":"mid","maxVisits":4,"priority":2}',
    ])
    order = [r["id"] for r in res if "moveInfos" in r]
    assert order == ["high", "mid", "low"]


def test_priorities_list_and_mismatch():
    res = _run_lines([
        '{"id":"p","moves":[["B","C3 N"]],"analyzeTurns":[0,1],"priorities":[1,7],"maxVisits":4}',
        '{"id":"bad","analyzeTurns":[0],"priorities":[1,2],"maxVisits":4}',
        '{"id":"plain","maxVisits":4}',
    ])
    errs = [r for r in res if "error" in r]
    assert errs and errs[0]["id"] == "bad" and errs[0]["field"] == "priorities"
    # "p" (priority 7) runs before "plain" (priority 0)
    order = [r["id"] for r in res if "moveInfos" in r]
    assert order.index("p") < order.index("plain")


def test_terminate_pending_query():
    res = _run_lines([
        '{"id":"keep","maxVisits":4}',
        '{"id":"doomed","moves":[["B","C3 N"]],"analyzeTurns":[0,1],"maxVisits":4}',
        '{"id":"t1","action":"terminate","terminateId":"doomed"}',
    ])
    nores = [r for r in res if r.get("noResults")]
    assert {(r["id"], r["turnNumber"]) for r in nores} == {("doomed", 0), ("doomed", 1)}
    assert all(not r["isDuringSearch"] for r in nores)
    # the action echoes back verbatim
    echo = [r for r in res if r.get("action") == "terminate"]
    assert echo and echo[0]["terminateId"] == "doomed" and echo[0]["id"] == "t1"
    # the doomed query never produces real results; keep does
    assert not any("moveInfos" in r and r["id"] == "doomed" for r in res)
    assert any("moveInfos" in r and r["id"] == "keep" for r in res)


def test_terminate_turn_subset_and_missing_id():
    res = _run_lines([
        '{"id":"q","moves":[["B","C3 N"]],"analyzeTurns":[0,1],"maxVisits":4}',
        '{"id":"t","action":"terminate","terminateId":"q","turnNumbers":[0]}',
        '{"id":"t2","action":"terminate"}',
    ])
    nores = [(r["id"], r["turnNumber"]) for r in res if r.get("noResults")]
    assert nores == [("q", 0)]
    # turn 1 still analyzed
    assert any("moveInfos" in r and r["id"] == "q" and r["turnNumber"] == 1 for r in res)
    assert any(r.get("field") == "terminateId" for r in res)


# ---------------------------------------------------------------------------
# symmetry duplication of analysis rows (duplicateForSymmetries,
# searchresults.cpp:986-1015)
# ---------------------------------------------------------------------------


def test_analysis_symmetry_duplication():
    """On the empty 5x5 board the full dihedral-8 group stabilizes the root;
    with rootSymmetryPruning the search visits only orbit representatives and
    the analysis re-expands each row over its orbit with isSymmetryOf."""
    import json

    from katacoffee_tpu.command.analysis import AnalysisEngine
    from katacoffee_tpu.search import SearchParams

    eng = AnalysisEngine(
        SearchParams(valueWeightExponent=0.0, rootSymmetryPruning=True),
        default_visits=16,
    )
    res = eng.handle_query({"id": "s", "maxVisits": 16})[0]
    infos = res["moveInfos"]
    dups = [mi for mi in infos if "isSymmetryOf" in mi]
    origs = {mi["move"] for mi in infos if "isSymmetryOf" not in mi}
    assert dups, "expected symmetric duplicates on the empty board"
    for d in dups:
        assert d["isSymmetryOf"] in origs
        orig = next(m for m in infos if m["move"] == d["isSymmetryOf"])
        assert d["visits"] == orig["visits"]
        assert d["winrate"] == orig["winrate"]
        assert len(d["pv"]) == len(orig["pv"])
    # orders are consecutive over the expanded list
    assert [mi["order"] for mi in infos] == list(range(len(infos)))
    # after a center move the stabilizer shrinks but search still works
    res2 = eng.handle_query(
        {"id": "s2", "moves": [["B", "C3 N"]], "maxVisits": 16}
    )[0]
    assert res2["moveInfos"]


def test_gtp_analyze_symmetry_duplication():
    from katacoffee_tpu.command.gtp import GTPEngine
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import SearchParams

    g = GTPEngine(
        GameConfig(5, 5, 4),
        SearchParams(valueWeightExponent=0.0, rootSymmetryPruning=True),
        max_visits=16,
    )
    resp, _ = g.handle("kata-analyze maxmoves 100")
    assert " isSymmetryOf " in resp


def test_print_tree_dump():
    """Engine.print_tree (the printTree role): root line + indented children
    with root-perspective values, branch descent errors on unvisited moves."""
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.program.engine import Engine
    from katacoffee_tpu.search import SearchParams

    eng = Engine(GameConfig(5, 5, 4), SearchParams(valueWeightExponent=0.0))
    eng.analyze(16)
    dump = eng.print_tree(max_depth=2)
    lines = dump.splitlines()
    assert lines[0].startswith("root: v=")
    assert len(lines) > 1 and lines[1].startswith("  ")
    assert " wr=" in lines[1] and " p=" in lines[1]
    # branch descent to a visited child works
    from katacoffee_tpu.game import io as gio

    x, y, d = gio.parse_loc(lines[1].strip().split(" v=")[0].strip(), eng.cfg)
    a = d * eng.cfg.area + y * eng.cfg.x_size + x
    sub = eng.print_tree(max_depth=1, branch=[a])
    assert sub.splitlines()[0].startswith("branch:")


def test_cross_query_batching():
    """Compatible pending queries merge into ONE device call (the
    numAnalysisThreads role); incompatible budgets stay separate."""
    import json

    from katacoffee_tpu.command.analysis import AnalysisEngine
    from katacoffee_tpu.search import SearchParams

    eng = AnalysisEngine(SearchParams(valueWeightExponent=0.0), default_visits=8)
    out = io.StringIO()
    lines = [
        '{"id":"a","maxVisits":8}',
        '{"id":"b","moves":[["B","C3 N"]],"maxVisits":8}',
        '{"id":"c","maxVisits":8,"analyzeTurns":[0]}',
        '{"id":"d","maxVisits":16}',
    ]
    eng.run(io.StringIO("\n".join(lines) + "\n"), out)
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    got = {r["id"] for r in rows if "moveInfos" in r}
    assert got == {"a", "b", "c", "d"}
    # a+b+c share (cfg, visits, params) -> one call; d runs alone
    assert eng.num_search_calls == 2
    # every result is well-formed
    for r in rows:
        if "moveInfos" in r:
            assert r["rootInfo"]["visits"] >= 8


def test_gtp_dynamic_params():
    """kata-get/set-param over any SearchParams field (superset of the
    reference's dynamic-param list); setting a param swaps the engine's
    compiled searches without losing the game state."""
    from katacoffee_tpu.command.gtp import GTPEngine
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import SearchParams

    g = GTPEngine(GameConfig(5, 5, 4), SearchParams(valueWeightExponent=0.0), max_visits=8)
    g.handle("play B C3 north")
    resp, _ = g.handle("kata-list-params")
    assert "maxVisits" in resp and "cpuctExploration" in resp
    resp, _ = g.handle("kata-get-param cpuctExploration")
    assert float(resp.split()[-1]) > 0
    resp, _ = g.handle("kata-set-param cpuctExploration 0.77")
    assert resp.startswith("=")
    resp, _ = g.handle("kata-get-param cpuctExploration")
    assert resp.split()[-1] == "0.77"
    # game state survived; searches still run with the new params
    resp, _ = g.handle("genmove w")
    assert resp.startswith("= ")
    resp, _ = g.handle("kata-get-param noSuchThing")
    assert resp.startswith("?")


def test_loadsgf_applies_placements(tmp_path):
    """AB/AW setup stones in an SGF reach the engine position (loadsgf and
    evalsgf previously dropped them; reference sgf.cpp placements role)."""
    from katacoffee_tpu.command.gtp import GTPEngine
    from katacoffee_tpu.dataio.sgf import write_sgf
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import SearchParams

    p = tmp_path / "setup.sgf"
    p.write_text(write_sgf(5, 5, 4, [], placements=[(0, 0, 1), (4, 4, 2)]))
    g = GTPEngine(GameConfig(5, 5, 4), SearchParams(valueWeightExponent=0.0), max_visits=8)
    resp, _ = g.handle(f"loadsgf {p}")
    assert resp.startswith("=")
    board = g.engine.board()
    assert board[0, 0] == 1 and board[4, 4] == 2
