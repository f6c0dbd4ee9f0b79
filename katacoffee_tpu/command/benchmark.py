"""Benchmark: visits/s sweep.

The role of the reference's `katago benchmark` (`cpp/command/benchmark.cpp:
366-405,894-896`): measure search throughput across parallelism settings and
report the best. The reference sweeps *thread counts*; the TPU analogue of
the parallelism axis is the *game batch size*, so we sweep B and report
NN-evaluated playouts per second (the reference's visits/s) at each.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from katacoffee_tpu.game.board import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, mcts
from katacoffee_tpu.search.mcts import run_search


def benchmark_search(
    cfg: GameConfig,
    sp: SearchParams,
    eval_fn,
    batch_sizes=(1, 16, 64, 256),
    num_visits: int = 200,
    reps: int = 3,
    log=print,
) -> dict:
    """Returns {batch_size: visits_per_second}. Compile time excluded
    (first call per shape is warmup, like the reference's warmup games).

    The `reps` searches are CHAINED inside one jitted fori_loop: per-call
    wall timings through tunneled TPU runtimes are unreliable (measured
    1000x off), so one device call runs all reps and the wall clock divides
    by reps — the measurement protocol used throughout this repo."""
    results = {}
    for B in batch_sizes:
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))

        def chained(roots, rng, reps=reps):
            def body(i, acc):
                t = run_search(
                    cfg, sp, eval_fn, roots, num_visits, jax.random.fold_in(rng, i)
                )
                return acc + t.stats.sum()

            return jax.lax.fori_loop(0, reps, body, 0.0)

        fn = jax.jit(chained)
        t0 = time.monotonic()
        float(fn(states, jax.random.PRNGKey(0)))  # forced fetch: never lies
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        float(fn(states, jax.random.PRNGKey(1)))
        dt = (time.monotonic() - t0) / reps
        vps = B * num_visits / dt
        results[B] = vps
        log(
            f"batch {B:5d}: {vps:12.1f} visits/s "
            f"({dt * 1000:.1f} ms/search, warmup+compile {compile_s:.1f}s)"
        )
    best = max(results, key=results.get)
    log(f"best: batch {best} at {results[best]:.1f} visits/s")
    return results


def main(argv, **kw):
    import argparse

    ap = argparse.ArgumentParser(prog="katacoffee benchmark")
    ap.add_argument("-model", default=None, help="exported model dir (default: uniform priors)")
    ap.add_argument("-visits", type=int, default=200)
    ap.add_argument("-batch-sizes", default="1,16,64,256")
    args = ap.parse_args(argv)

    cfg = GameConfig(5, 5, 4)
    if args.model:
        from katacoffee_tpu.dataio.checkpoints import load_exported_model

        model, params, cfg, meta = load_exported_model(args.model)
        eval_fn = mcts.make_nn_eval_fn(cfg, model, params)
        print(f"model: {meta['name']}")
    else:
        eval_fn = mcts.uniform_eval_fn(cfg)
        print("model: none (uniform priors)")
    sp = SearchParams.for_selfplay()
    sizes = tuple(int(s) for s in args.batch_sizes.split(","))
    benchmark_search(cfg, sp, eval_fn, batch_sizes=sizes, num_visits=args.visits)
