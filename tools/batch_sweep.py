"""Batch-size sweep at the selfplay operating point (VERDICT round-1 item 5).

Measures delivered visits/s (bench.py's metric, same forced-fetch timing)
for B in {256, 512, 1024} at 600 visits/move with the b6c96 net on the real
TPU chip. CLAUDE.md's analysis says per-level small-op overhead dominates
the search; a larger B amortizes it — this records whether it does.

Run on the TPU:  python tools/batch_sweep.py [B ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def measure(B: int, num_sims: int = 600, moves_per_segment: int = 4) -> float:
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_selfplay()
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=num_sims)

    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    seg = jax.jit(
        lambda s, e, r: run_selfplay_segment(
            cfg, sp, settings, eval_fn, s, e, r, moves_per_segment
        )
    )
    # short segments: keep each device call well under the ~20s watchdog
    s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
    float(jnp.sum(traj.played_action))  # forced fetch
    segments_timed = 2
    t0 = time.perf_counter()
    for i in range(segments_timed):
        s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
    float(jnp.sum(traj.played_action))
    dt = time.perf_counter() - t0
    return B * num_sims * moves_per_segment * segments_timed / dt


def main(batches):
    results = {}
    for B in batches:
        # halve segment length as B doubles to keep call duration flat
        mps = max(1, 8 * 256 // (2 * B))
        v = measure(B, moves_per_segment=mps)
        results[B] = round(v, 1)
        print(f"B={B:5d}: {v:10.1f} visits/s", flush=True)
    print(json.dumps({"batch_sweep_visits_per_s": results}))


if __name__ == "__main__":
    bs = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    main(bs)
