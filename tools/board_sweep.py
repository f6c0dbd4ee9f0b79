"""Cross-board-size throughput sweep on the real TPU chip.

The headline bench (bench.py) runs the reference training op point on
(5,5,4). The reference engine supports boards up to 10x10
(`/root/reference/cpp/game/board.h:15` MAX_LEN) with any win length; this
tool measures delivered visits/s of the SAME selfplay hot path at larger
GameConfigs to demonstrate the framework is not specialized to the 5x5
headline shape. Larger boards shift the gather trade-off (CLAUDE.md: the
one-hot descent einsum materializes [B,A,N] through HBM, cost growing with
the action space A=x*y*4), so batch sizes are scaled down per shape to keep
single device calls under the tunnel watchdog (~20s).

Usage:  python tools/board_sweep.py [out.json]
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

# (x, y, win_len, batch, moves_per_segment, timed_segments)
SHAPES = [
    (5, 5, 4, 512, 2, 4),   # headline op point (bench.py)
    (7, 7, 5, 256, 1, 4),
    (9, 9, 5, 128, 1, 3),
    (10, 10, 5, 128, 1, 3),  # reference MAX_LEN board
]


def measure(x, y, win_len, batch, mps, reps):
    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(x, y, win_len)
    sp = SearchParams.for_selfplay()
    num_sims = 600
    model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=num_sims)

    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(batch))
    ep = jnp.zeros((batch,), jnp.int32)
    seg = jax.jit(
        lambda s, e, r: run_selfplay_segment(cfg, sp, settings, eval_fn, s, e, r, mps)
    )

    s2, e2, traj = seg(states, ep, jax.random.PRNGKey(0))
    float(jnp.sum(traj.played_action))  # forced fetch (see bench.py)

    t0 = time.perf_counter()
    for i in range(reps):
        s2, e2, traj = seg(s2, e2, jax.random.PRNGKey(1 + i))
    float(jnp.sum(traj.played_action))
    dt = time.perf_counter() - t0
    vps = batch * num_sims * mps * reps / dt
    return {
        "board": f"{x}x{y}w{win_len}",
        "batch": batch,
        "visits_per_sec": round(vps, 1),
        "sec_per_move_per_game": round(dt / (mps * reps) / batch, 6),
        "wall_s": round(dt, 2),
    }


def main(out_path=None):
    rows = []
    for shape in SHAPES:
        r = measure(*shape)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
