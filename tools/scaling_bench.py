"""Sharded-selfplay scaling measurement on the virtual CPU mesh.

BASELINE.json "Scaling" row / VERDICT round-1 item 5: record per-device
throughput retention of the sharded selfplay step on an 8-device virtual
mesh. All 8 virtual devices share ONE physical core, so the honest form is
weak scaling with the runs serialized: B per device alone vs 8xB sharded
over the 8-device mesh. If sharding is free, the mesh run takes exactly 8x
the wall clock, i.e. the same total rows/s; retention = mesh / single
(1.0 = per-device throughput fully retained).

Real multi-chip perf must be measured on hardware (tools/launch_2host.sh);
this script validates that the SPMD program itself adds no per-step cost
beyond the collectives XLA inserts.

Usage:  python tools/scaling_bench.py [per_device_batch] [num_sims] [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # before first jax use


def main(per_device_batch: int = 32, num_sims: int = 24, reps: int = 3):
    import jax.numpy as jnp

    from katacoffee_tpu.game.board import GameConfig, init_state
    from katacoffee_tpu.parallel.mesh import make_data_mesh, shard_leading_axis
    from katacoffee_tpu.search import SearchParams, uniform_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    from katacoffee_tpu.parallel.mesh import shard_map_batched

    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_selfplay()
    settings = SelfplaySettings(num_sims=num_sims)
    ev = uniform_eval_fn(cfg)
    moves = 16
    base = functools.partial(run_selfplay_segment, cfg, sp, settings, ev)

    def run(mesh_devices: int, batch: int) -> float:
        fn = lambda s, e, r: base(s, e, r, moves)
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(batch))
        ep = jnp.zeros((batch,), jnp.int32)
        if mesh_devices > 1:
            mesh = make_data_mesh(mesh_devices)
            states = shard_leading_axis(mesh, states)
            ep = shard_leading_axis(mesh, ep)
            # the production mesh path (command/selfplay.py): manual SPMD
            fn = shard_map_batched(
                mesh, fn, batch, rng_arg_index=2, time_axis_sizes=(moves,)
            )
        step = jax.jit(fn)
        rng = jax.random.PRNGKey(0)
        # warmup/compile
        s, e, traj = step(states, ep, rng)
        jax.block_until_ready(traj.played_action)
        t0 = time.perf_counter()
        for i in range(reps):
            s, e, traj = step(s, e, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(traj.played_action)
        dt = time.perf_counter() - t0
        return batch * moves * reps / dt

    n_dev = len(jax.devices())
    shards = min(8, n_dev)
    single = run(1, per_device_batch)
    sharded = run(shards, shards * per_device_batch)
    print(f"devices available: {n_dev}")
    print(f"1 device, B={per_device_batch:4d}: {single:10.1f} rows/s ({num_sims} visits)")
    print(f"{shards} shards, B={shards * per_device_batch:4d}: {sharded:10.1f} rows/s total (serialized on 1 core)")
    print(f"per-device throughput retention: {sharded / single:.3f}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
