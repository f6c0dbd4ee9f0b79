"""Golden-output GTP protocol tests — tier 3 of the reference's test
strategy (cpp/runcmdtests.sh: feed tests/gtp/*.txt scripts into the engine,
diff captured output against checked-in goldens). Scripts stick to
deterministic commands (no NN, no sampling), so the byte-exact golden is
stable across platforms."""

import io
import os

import pytest

from katacoffee_tpu.command.gtp import GTPEngine
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.search import SearchParams

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def run_script(name: str) -> str:
    eng = GTPEngine(
        GameConfig(5, 5, 4),
        SearchParams(valueWeightExponent=0.0),
        max_visits=8,
        seed=0,
    )
    out = io.StringIO()
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        eng.run(f, out)
    return out.getvalue()


@pytest.mark.parametrize(
    "script",
    [
        "gtp_basic.txt",
        "gtp_time.txt",
        "gtp_set_position.txt",
        "gtp_rules.txt",
        "gtp_printsgf.txt",
        "gtp_errors.txt",
        "gtp_analyze.txt",
        "gtp_handicap.txt",
    ],
)
def test_gtp_golden(script):
    got = run_script(script)
    golden_path = os.path.join(GOLDEN_DIR, script.replace(".txt", ".expected"))
    if not os.path.exists(golden_path):  # bootstrap: write the golden once
        with open(golden_path, "w") as f:
            f.write(got)
        pytest.skip(f"golden bootstrapped at {golden_path}; rerun to verify")
    with open(golden_path) as f:
        expected = f.read()
    assert got == expected, (
        "GTP output diverged from the golden. If the change is intentional, "
        f"delete {golden_path} and rerun to regenerate."
    )


def run_model_script(name: str) -> str:
    """Model-backed variant: the checked-in tiny net drives kata-raw-nn and
    the ownership analysis surfaces (tier-2/3 hybrid — same fixed weights as
    the tier-2 search traces, so the bytes are stable on the CPU test
    platform)."""
    import jax

    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.search import make_nn_eval_fn, make_raw_forward_fn

    model, params, cfg, meta = load_exported_model(
        os.path.join(GOLDEN_DIR, "tinynet")
    )
    eng = GTPEngine(
        cfg,
        SearchParams(valueWeightExponent=0.0),
        eval_fn=make_nn_eval_fn(cfg, model, params),
        raw_fwd=make_raw_forward_fn(cfg, model, params),
        max_visits=8,
        seed=0,
    )
    out = io.StringIO()
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        eng.run(f, out)
    return out.getvalue()


def test_gtp_model_golden():
    got = run_model_script("gtp_model.txt")
    golden_path = os.path.join(GOLDEN_DIR, "gtp_model.expected")
    if not os.path.exists(golden_path):  # bootstrap: write the golden once
        with open(golden_path, "w") as f:
            f.write(got)
        pytest.skip(f"golden bootstrapped at {golden_path}; rerun to verify")
    with open(golden_path) as f:
        expected = f.read()
    assert got == expected, (
        "GTP output diverged from the golden. If the change is intentional, "
        f"delete {golden_path} and rerun to regenerate."
    )
