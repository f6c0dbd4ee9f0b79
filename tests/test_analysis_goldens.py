"""Golden-output analysis-engine protocol tests — the analysis half of the
reference's tier-3 strategy (cpp/runcmdtests.sh feeds tests/analysis/*.txt
JSON scripts into the engine and diffs captured stdout). Scripts run with
the deterministic uniform eval and a fixed seed, so goldens are byte-exact
on the CPU test platform."""

import io
import os

import pytest

from katacoffee_tpu.command.analysis import AnalysisEngine
from katacoffee_tpu.search import SearchParams

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def run_script(name: str) -> str:
    eng = AnalysisEngine(
        SearchParams(valueWeightExponent=0.0), default_visits=8
    )
    out = io.StringIO()
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        eng.run(f, out)
    return out.getvalue()


@pytest.mark.parametrize(
    "script",
    ["analysis_basic.txt", "analysis_errors.txt", "analysis_avoidallow.txt"],
)
def test_analysis_golden(script):
    got = run_script(script)
    golden_path = os.path.join(GOLDEN_DIR, script.replace(".txt", ".expected"))
    if not os.path.exists(golden_path):  # bootstrap: write the golden once
        with open(golden_path, "w") as f:
            f.write(got)
        pytest.skip(f"golden bootstrapped at {golden_path}; rerun to verify")
    with open(golden_path) as f:
        expected = f.read()
    assert got == expected, (
        "analysis output diverged from the golden. If the change is "
        f"intentional, delete {golden_path} and rerun to regenerate."
    )


def test_avoid_allow_respected():
    """Semantic check on top of the byte goldens: avoided moves receive no
    visits; allow restricts the root to the listed moves."""
    import json

    out = run_script("analysis_avoidallow.txt")
    results = [json.loads(l) for l in out.splitlines()]
    by_id = {r["id"]: r for r in results if "id" in r}
    a0 = by_id["a0"]
    assert all(not mi["move"].startswith("C3") for mi in a0["moveInfos"])
    a1 = by_id["a1"]
    assert {mi["move"] for mi in a1["moveInfos"]} <= {"A1NE", "C3W"}
    # avoid for WHITE must not restrict black's root: C3 N (flat action
    # 0*25 + 2*5 + 2 = 12) keeps a positive root prior
    a2 = by_id["a2"]
    assert a2["policy"][12] > 0.0


def test_include_ownership_with_model():
    """includeOwnership emits the TREE-AVERAGED ownership map (root-mover
    perspective, in [-1,1]) when a model is attached — the analysis
    protocol's ownership field (Analysis_Engine.md; getAverageTreeOwnership
    recomputed from the packed tree, search/ownership.py)."""
    import jax

    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import make_nn_eval_fn, make_raw_forward_fn

    CFG = GameConfig(5, 5, 4)
    model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    eng = AnalysisEngine(
        SearchParams(valueWeightExponent=0.0),
        eval_fn_factory=lambda cfg: make_nn_eval_fn(cfg, model, params),
        raw_forward_factory=lambda cfg: make_raw_forward_fn(cfg, model, params),
        default_visits=8,
    )
    res = eng.handle_query(
        {"id": "o", "moves": [["B", "C3 N"]], "maxVisits": 8, "includeOwnership": True}
    )
    own = res[0]["ownership"]
    assert len(own) == 25
    assert all(-1.0 <= v <= 1.0 for v in own)
    # without a raw factory the field is simply omitted
    eng2 = AnalysisEngine(SearchParams(valueWeightExponent=0.0), default_visits=8)
    res2 = eng2.handle_query({"id": "o", "maxVisits": 8, "includeOwnership": True})
    assert "ownership" not in res2[0]
