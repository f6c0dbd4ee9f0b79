"""Search profiling harness (the methodology behind the round-1 perf trail).

Usage (ONE TPU process at a time; see CLAUDE.md tunnel notes):
    python tools/profile_search.py nn        # NN forward cost vs batch
    python tools/profile_search.py base      # one-move 600-visit searches
    python tools/profile_search.py bsweep    # batch-size scaling
    python tools/profile_search.py trace     # jax.profiler trace of a search
    python tools/profile_search.py parse     # op-level breakdown of the trace

The `parse` step aggregates device-op durations from the chrome trace and
prints the top ops; map fusion names back to source with the compiled HLO
(`jax.jit(...).lower(...).compile().as_text()`) — metadata on each fusion
carries the mcts.py source line. Measured conclusions live in CLAUDE.md
("Performance facts"); re-measure before re-attempting anything listed as
net-negative there.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

CACHE = os.environ.get("KC_JAX_CACHE", "/root/repo/.jax_cache")
os.makedirs(CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/kc_jaxtrace"


def _setup():
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn

    cfg = GameConfig(5, 5, 4)
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    return cfg, SearchParams.for_selfplay(), make_nn_eval_fn(cfg, model, params), init_state


def timed_search(name, B, num_sims, reps=2, max_nodes=None):
    from katacoffee_tpu.search.mcts import run_search

    cfg, sp, ev, init_state = _setup()
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    if max_nodes is None:
        max_nodes = int(num_sims * 0.64)
    f = jax.jit(lambda s, r: run_search(cfg, sp, ev, s, num_sims, r, max_nodes=max_nodes))
    t = f(states, jax.random.PRNGKey(0))
    float(jnp.sum(t.stats))  # forced fetch — block_until_ready can lie
    t0 = time.perf_counter()
    for i in range(reps):
        t = f(states, jax.random.PRNGKey(i + 1))
    float(jnp.sum(t.stats))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"name": name, "B": B, "sims": num_sims, "sec": round(dt, 3),
                      "visits_per_s": round(B * num_sims / dt, 1)}), flush=True)


def nn_loop(B, iters=100):
    cfg, sp, ev, init_state = _setup()
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))

    def body(i, acc):
        r = ev(states, jax.random.fold_in(jax.random.PRNGKey(0), i))
        return acc + r.utility.sum()

    f = jax.jit(lambda: jax.lax.fori_loop(0, iters, body, 0.0))
    f().block_until_ready()
    t0 = time.perf_counter()
    f().block_until_ready()
    print(json.dumps({"name": "nn_forward", "B": B,
                      "ms_per_call": round((time.perf_counter() - t0) / iters * 1e3, 3)}),
          flush=True)


def trace():
    from katacoffee_tpu.search.mcts import run_search

    cfg, sp, ev, init_state = _setup()
    B, V = 256, 600
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    f = jax.jit(lambda s, r: run_search(cfg, sp, ev, s, V, r, max_nodes=384))
    t = f(states, jax.random.PRNGKey(0))
    jax.block_until_ready(t.stats)
    with jax.profiler.trace(TRACE_DIR):
        t = f(states, jax.random.PRNGKey(1))
        jax.block_until_ready(t.stats)
    print("trace written to", TRACE_DIR)


def parse(top=30):
    import collections
    import glob
    import gzip

    p = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(p))
    pids = {e["pid"]: e["args"]["name"] for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    for name, us in agg.most_common(top):
        print(f"{us / 1e3:10.1f}ms {cnt[name]:6d}x  {name[:120]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    if which == "nn":
        for b in (256, 1024, 2048):
            nn_loop(b)
    elif which == "base":
        timed_search("b6c96_600", 256, 600)
    elif which == "bsweep":
        for b in (256, 512, 1024):
            timed_search(f"b6c96_150_B{b}", b, 150)
    elif which == "trace":
        trace()
    elif which == "parse":
        parse()
