#!/usr/bin/env python3
"""Round-5 combined perf probe (tunnel-budget-aware): measures, in ONE
process with one compilation cache,

  * vectorized K playouts/round speed at the bench op point: K=1 vs K=2
    (kvec arms; strength gate runs separately on CPU — semantics are
    platform-independent, only speed needs the chip), and
  * segment-length (host-sync cadence) arms: 2 vs 4 moves per device call
    at K=1 (the K=1/mps=2 arm is shared between the two experiments, so
    this costs three big-segment compiles instead of five).

Updates artifacts/kvec_ab.json (speed section) and artifacts/seglen_ab.json.

Run on the real TPU: python tools/round5_perf_probe.py
"""
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    cache = os.environ.get("KC_CACHE_DIR", "/root/repo/.jax_cache_r5probe")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    num_sims = 600
    B = 512
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=num_sims)

    def measure(K, mps, total_moves=24):
        sp = dataclasses.replace(SearchParams.for_selfplay(), numSearchThreads=K)
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        seg = jax.jit(
            lambda s, e, r: run_selfplay_segment(
                cfg, sp, settings, eval_fn, s, e, r, mps
            )
        )
        t0 = time.perf_counter()
        s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
        float(jnp.sum(traj.played_action))  # forced fetch
        compile_s = time.perf_counter() - t0
        n_calls = total_moves // mps
        t0 = time.perf_counter()
        for i in range(n_calls):
            s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
        float(jnp.sum(traj.played_action))
        dt = time.perf_counter() - t0
        vps = B * num_sims * n_calls * mps / dt
        print(
            f"K={K} mps={mps}: {vps:,.0f} visits/s "
            f"({dt/n_calls:.2f}s/call, compile+warm {compile_s:.0f}s)",
            flush=True,
        )
        return vps, dt / n_calls

    arms = {}
    part = os.path.join(REPO, "artifacts", "r5probe_partial.json")
    for name, K, mps in (("k1_m2", 1, 2), ("k2_m2", 2, 2), ("k1_m4", 1, 4)):
        vps, spc = measure(K, mps)
        arms[name] = {"visits_per_sec": round(vps, 1), "sec_per_call": round(spc, 2)}
        json.dump(arms, open(part, "w"), indent=2)  # survive a mid-run kill

    # fold into the two artifact files
    kv_path = os.path.join(REPO, "artifacts", "kvec_ab.json")
    kv = json.load(open(kv_path)) if os.path.exists(kv_path) else {}
    kv.setdefault("speed_tpu_oppoint", {})
    kv["speed_tpu_oppoint"]["K1"] = arms["k1_m2"]["visits_per_sec"]
    kv["speed_tpu_oppoint"]["K2"] = arms["k2_m2"]["visits_per_sec"]
    kv["batch"], kv["visits"] = B, num_sims
    json.dump(kv, open(kv_path, "w"), indent=2)

    sl_path = os.path.join(REPO, "artifacts", "seglen_ab.json")
    json.dump(
        {
            "batch": B,
            "visits": num_sims,
            "arms": {"moves2": arms["k1_m2"], "moves4": arms["k1_m4"]},
        },
        open(sl_path, "w"),
        indent=2,
    )
    print("wrote artifacts/kvec_ab.json + artifacts/seglen_ab.json", flush=True)


if __name__ == "__main__":
    main()
