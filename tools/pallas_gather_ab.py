"""A/B the Pallas child-stats gather against the XLA one-hot einsum at
large-board selfplay shapes, on the real chip.

`search/mcts.py:_gather_child_stats` switches to the Pallas VMEM-tiled
gather (ops/gather.py) when B*A*N > _PALLAS_GATHER_MIN_ELEMS per fetch.
This tool measures delivered visits/s at shapes straddling the switch,
with the switch forced OFF (einsum) and at its default, plus a
correctness cross-check of one searched tree between the two paths.

Usage: python tools/pallas_gather_ab.py [out.json]
One TPU process at a time — do not run while another device job is live.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from katacoffee_tpu.search import mcts  # noqa: E402
from tools.board_sweep import measure  # noqa: E402

# (x, y, win_len, batch, moves_per_segment, timed_segments)
SHAPES = [
    (9, 9, 5, 256, 1, 3),
    (10, 10, 5, 256, 1, 3),
    (10, 10, 5, 512, 1, 2),
]


def check_tree_equivalence():
    """Same search, einsum vs kernel child-stats fetch: trees must agree
    (the gather is exact — one-hot matmul of f32 rows both ways)."""
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.search import SearchParams
    from katacoffee_tpu.search.mcts import uniform_eval_fn

    cfg = GameConfig(10, 10, 5)
    sp = SearchParams(valueWeightExponent=0.0)
    ev = uniform_eval_fn(cfg)
    B = 128
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))

    trees = {}
    saved = mcts._PALLAS_GATHER_MIN_ELEMS
    for name, thresh in (("einsum", 1 << 62), ("pallas", 0)):
        mcts._PALLAS_GATHER_MIN_ELEMS = thresh
        trees[name] = jax.jit(
            lambda s: mcts.run_search(
                cfg, sp, ev, s, 64, jax.random.PRNGKey(7), max_nodes=66
            )
        )(states)
    mcts._PALLAS_GATHER_MIN_ELEMS = saved
    a, b = trees["einsum"], trees["pallas"]
    same_vis = bool(jnp.array_equal(a.visits, b.visits))
    max_stat_diff = float(jnp.abs(a.stats - b.stats).max())
    print(json.dumps({"check": "tree_equivalence", "same_visits": same_vis,
                      "max_stat_diff": max_stat_diff}), flush=True)
    return same_vis and max_stat_diff < 1e-4


def main(out_path=None):
    rows = []
    ok = check_tree_equivalence()
    rows.append({"check": "tree_equivalence", "ok": ok})
    saved = mcts._PALLAS_GATHER_MIN_ELEMS
    for mode, thresh in (("einsum", 1 << 62), ("pallas", 0)):
        mcts._PALLAS_GATHER_MIN_ELEMS = thresh
        for shape in SHAPES:
            r = measure(*shape)
            r["gather"] = mode
            elems = shape[3] * (shape[0] * shape[1] * 4) * 386
            r["onehot_elems_M"] = round(elems / 1e6, 1)
            rows.append(r)
            print(json.dumps(r), flush=True)
    mcts._PALLAS_GATHER_MIN_ELEMS = saved
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
