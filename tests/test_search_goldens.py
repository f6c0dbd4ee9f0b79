"""Tier-2 golden search traces with a checked-in tiny net (SURVEY.md §4):
the role of the reference's `runsearchtests` + `cpp/tests/models/` +
`tests/results/*.txt` — a deterministic search against fixed weights whose
root statistics are pinned in git, so any refactor that shifts search
behavior shows up as a diff, not as a silently different engine.

Regenerate after an *intentional* behavior change with:
    REGEN_GOLDENS=1 python -m pytest tests/test_search_goldens.py -q
(The reference does the same: re-run the shell driver and commit the new
results — runsearchtests.sh.)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.game.board import legal_mask_flat, step
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.search import (
    SearchParams,
    make_nn_eval_fn,
    root_values,
    root_visit_counts,
    run_search,
)
from katacoffee_tpu.search.mcts import root_play_selection_weights

CFG = GameConfig(5, 5, 4)
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
NET_DIR = os.path.join(GOLDEN_DIR, "tinynet")
TRACE = os.path.join(GOLDEN_DIR, "search_trace.json")
REGEN = bool(os.environ.get("REGEN_GOLDENS"))


def _tiny_net_params():
    """Checked-in b1c6 weights (the embedded-tinymodel role,
    tinymodel.cpp:14-40). Created once under REGEN_GOLDENS; afterwards the
    exact bytes in git are what every run loads."""
    from katacoffee_tpu.dataio.checkpoints import export_model, load_exported_model
    from katacoffee_tpu.nn.model import CoffeeNet, init_params

    if not os.path.isdir(NET_DIR):
        if not REGEN:
            pytest.fail(f"missing checked-in tiny net {NET_DIR}; run with REGEN_GOLDENS=1")
        model = CoffeeNet(get_model_spec("b1c6"), win_len=CFG.win_len)
        params = init_params(model, CFG, jax.random.PRNGKey(7))
        export_model(GOLDEN_DIR, "tinynet", params, "b1c6", CFG)
    model, params, _, _ = load_exported_model(NET_DIR)
    return model, params


def _nth_legal(state, n):
    mask = np.asarray(legal_mask_flat(CFG, state))
    legal = np.flatnonzero(mask)
    return int(legal[n % len(legal)])


def _positions():
    """Three deterministic positions: empty board, a 2-ply opening, and a
    6-ply midgame (moves chosen as fixed ranks among the legal actions, so
    they stay legal by construction)."""
    out = []
    s = init_state(CFG)
    out.append(s)
    for k, depth in ((5, 2), (11, 4)):
        for _ in range(depth):
            s = step(CFG, s, jnp.asarray(_nth_legal(s, k), jnp.int32))
        out.append(s)
    return out


def _compute_trace():
    model, params = _tiny_net_params()
    ev = make_nn_eval_fn(CFG, model, params)
    sp = SearchParams.for_tests_v2()
    states = _positions()
    roots = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    tree = jax.jit(
        lambda r, k: run_search(CFG, sp, ev, r, 80, k)
    )(roots, jax.random.PRNGKey(123))
    visits = np.asarray(root_visit_counts(tree))
    vals = {k: np.asarray(v) for k, v in root_values(tree).items()}
    weights = np.asarray(root_play_selection_weights(sp, tree))
    out = []
    for b in range(len(states)):
        nz = np.flatnonzero(visits[b] > 0)
        out.append(
            {
                "visits": {str(int(a)): int(visits[b, a]) for a in nz},
                "root_visits": int(vals["root_visits"][b]),
                "root_utility": float(vals["root_utility"][b]),
                "root_wl": float(vals["root_wl"][b]),
                "root_draw": float(vals["root_draw"][b]),
                "best_move": int(np.argmax(weights[b])),
                "weights": {str(int(a)): float(weights[b, a]) for a in np.flatnonzero(weights[b] > 0)},
            }
        )
    return out


def test_golden_search_trace():
    got = _compute_trace()
    if REGEN:
        with open(TRACE, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
    if not os.path.exists(TRACE):
        pytest.fail(f"missing golden {TRACE}; run with REGEN_GOLDENS=1")
    with open(TRACE) as f:
        exp = json.load(f)
    assert len(got) == len(exp)
    for b, (g, e) in enumerate(zip(got, exp)):
        assert g["visits"] == e["visits"], f"pos {b}: visit distribution changed"
        assert g["root_visits"] == e["root_visits"], b
        assert g["best_move"] == e["best_move"], b
        for k in ("root_utility", "root_wl", "root_draw"):
            assert g[k] == pytest.approx(e[k], abs=2e-4), (b, k)
        assert set(g["weights"]) == set(e["weights"]), b
        for a, w in e["weights"].items():
            assert g["weights"][a] == pytest.approx(w, abs=2e-4), (b, a)
