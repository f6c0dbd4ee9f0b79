"""Serving throughput benchmark: the JSON-lines analysis engine on the real
TPU chip, driven through its production protocol path (AnalysisEngine.run),
so cross-position AND cross-query batching are both exercised — the role of
the reference's `numAnalysisThreads` parallel analysis engine
(`/root/reference/cpp/command/analysis.cpp:106-191`) measured the same way
its users would: positions analyzed per second at a fixed visit budget.

Workload: NUM_QUERIES queries × TURNS_PER_QUERY analyzeTurns over distinct
random (5,5,4) games, VISITS visits per position, b6c96 net. Compatible
queries merge into padded batched device calls (see analysis.py module
docstring), so steady-state throughput reflects a loaded analysis server,
not one-query-at-a-time latency.

Usage: python tools/analysis_bench.py [out.json]
One TPU process at a time — do not run while another device job is live.
"""

import io
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

NUM_QUERIES = 32
TURNS_PER_QUERY = 8
VISITS = 200
WARMUP_QUERIES = 4

_DIRS = ["N", "W", "NW", "NE"]


def _random_game_moves(rng: random.Random, min_len: int = 14):
    """Random legal move list as analysis-protocol ["B", "C3 NW"] pairs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "oracle", os.path.join(os.path.dirname(__file__), "..", "tests", "oracle.py")
    )
    oracle = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("oracle", oracle)
    spec.loader.exec_module(oracle)
    while True:
        g = oracle.OracleGame(5, 5, 4)
        moves = []
        while not g.done:
            x, y, d = rng.choice(g.legal_moves())
            pla = "B" if g.to_move == oracle.BLACK else "W"
            moves.append([pla, f"{chr(ord('A') + x)}{y + 1} {_DIRS[d]}"])
            g.play(x, y, d)
        if len(moves) >= min_len:
            return moves


def main(out_path=None):
    from katacoffee_tpu.command.analysis import AnalysisEngine
    from katacoffee_tpu.game import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn

    cfg = GameConfig(5, 5, 4)
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))

    def factory(c, _m=model, _p=params):
        return make_nn_eval_fn(c, _m, _p)

    engine = AnalysisEngine(
        SearchParams.for_tests_v2(), factory, default_visits=VISITS
    )

    rng = random.Random(20260819)

    def make_query(i):
        moves = _random_game_moves(rng, min_len=TURNS_PER_QUERY + 6)
        turns = sorted(rng.sample(range(4, len(moves)), TURNS_PER_QUERY))
        return {
            "id": f"q{i}",
            "moves": moves,
            "rules": "coffee",
            "boardXSize": 5,
            "boardYSize": 5,
            "analyzeTurns": turns,
            "maxVisits": VISITS,
        }

    def run_batch(queries):
        infile = io.StringIO("".join(json.dumps(q) + "\n" for q in queries))
        outfile = io.StringIO()
        engine.run(infile=infile, outfile=outfile)
        results = [json.loads(l) for l in outfile.getvalue().splitlines()]
        errors = [r for r in results if "error" in r]
        assert not errors, errors[:3]
        return [r for r in results if "turnNumber" in r]

    # warmup: compiles the (batch, visits) search shapes
    run_batch([make_query(1000 + i) for i in range(WARMUP_QUERIES)])

    queries = [make_query(i) for i in range(NUM_QUERIES)]
    t0 = time.perf_counter()
    rows = run_batch(queries)
    dt = time.perf_counter() - t0
    n_pos = len(rows)
    assert n_pos == NUM_QUERIES * TURNS_PER_QUERY, n_pos

    rep = {
        "metric": "analysis_positions_per_sec_b6c96_200visits",
        "value": round(n_pos / dt, 2),
        "unit": "positions/s",
        "num_queries": NUM_QUERIES,
        "turns_per_query": TURNS_PER_QUERY,
        "visits": VISITS,
        "wall_s": round(dt, 2),
        "device_calls": engine.num_search_calls,
    }
    print(json.dumps(rep))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
