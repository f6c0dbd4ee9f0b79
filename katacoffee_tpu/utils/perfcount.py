"""Search performance accounting — the NNEvaluator stats role
(`/root/reference/cpp/neuralnet/nneval.h:171-176` reports total NN rows,
batches, and average batch occupancy; `reportStats` in cpp/command/
benchmark.cpp surfaces them). The lockstep design inverts the batching (the
search submits one full-width NN forward per simulate round instead of an
async server coalescing rows), so the equivalent counters are:

  * submitted NN rows  = B x rounds (every round evaluates the whole batch,
    masked games included — that is the price of lockstep);
  * delivered visits   = B x num_sims per move (what bench.py reports);
  * occupancy          = mean per-game visit deficit / max deficit — the
    fraction of submitted rows that belong to games still short of their
    visit target (tree reuse gives games different deficits; the max gates
    the round count).

plus XLA's own cost model (`compiled.cost_analysis()`) for FLOP/byte
accounting, from which MFU against the chip's bf16 peak and an HBM-bandwidth
estimate follow. All wall-clock numbers must come from forced host fetches
(CLAUDE.md timing-trust note)."""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp

# v5e peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM per chip.
PEAK_FLOPS = {"tpu v5 lite": 197e12, "cpu": 0.0}
PEAK_HBM_BYTES = {"tpu v5 lite": 819e9, "cpu": 0.0}


def device_peaks() -> tuple[float, float]:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v, PEAK_HBM_BYTES[k]
    return 0.0, 0.0


def cost_analysis(compiled) -> dict[str, float]:
    """Normalize compiled.cost_analysis() across jax versions (list/dict)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    out = {}
    for k in ("flops", "bytes accessed"):
        if k in ca:
            out[k.replace(" ", "_")] = float(ca[k])
    # per-memory-space breakdown when present (bytes accessed{0} = output etc)
    return out


def search_counters(
    cfg,
    sp,
    eval_fn,
    init_state_fn,
    batch_size: int,
    num_sims: int,
    moves: int = 10,
    seed: int = 0,
    node_budget_frac: float = 0.3,
) -> dict[str, Any]:
    """Run `moves` consecutive searches with tree reuse at the bench operating
    point, collecting per-move diag (rounds, start visits) from
    run_search(with_diag=True). Returns counters + forced-fetch wall time.

    Mirrors the selfplay actor's search->select->step move cycle without the
    training-data machinery, so the counters describe the same compiled
    search the headline bench times."""
    import functools

    from katacoffee_tpu.game.jitted import vstep_fn
    from katacoffee_tpu.search import mcts

    B = batch_size
    max_nodes = max(64, int(num_sims * node_budget_frac) + 2)
    step = vstep_fn(cfg)

    @functools.partial(jax.jit, donate_argnums=())
    def first_move(states, key):
        k_s, k_m = jax.random.split(key)
        tree, diag = mcts.run_search(
            cfg, sp, eval_fn, states, num_sims, k_s, max_nodes, with_diag=True
        )
        action = mcts.select_moves(cfg, sp, tree, k_m)
        nxt = step(states, jnp.where(states.done, 0, action))
        return nxt, tree, action, diag

    @functools.partial(jax.jit, donate_argnums=())
    def next_move(states, tree, prev_action, key):
        k_s, k_m = jax.random.split(key)
        reuse_ok = ~states.done
        tree, diag = mcts.run_search(
            cfg, sp, eval_fn, states, num_sims, k_s, max_nodes,
            reuse_tree=tree, reuse_actions=prev_action, reuse_ok=reuse_ok,
            with_diag=True,
        )
        action = mcts.select_moves(cfg, sp, tree, k_m)
        nxt = step(states, jnp.where(states.done, 0, action))
        return nxt, tree, action, diag

    init_state = init_state_fn
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    key = jax.random.PRNGKey(seed)

    # warm both compiles
    key, k = jax.random.split(key)
    s, t, a, d = first_move(states, k)
    key, k = jax.random.split(key)
    s2, t2, a2, d2 = next_move(s, t, a, k)
    float(jnp.sum(a2))

    per_move = []
    key = jax.random.PRNGKey(seed + 1)
    key, k = jax.random.split(key)
    s, t, a, d = first_move(states, k)
    float(jnp.sum(a))  # fence: keep the fresh search out of the timed window
    t0 = time.perf_counter()
    per_move.append(d)
    for _ in range(moves - 1):
        key, k = jax.random.split(key)
        s, t, a, d = next_move(s, t, a, k)
        per_move.append(d)
    float(jnp.sum(a))
    wall_reused = time.perf_counter() - t0  # moves-1 reused searches

    rounds = [int(d["rounds"]) for d in per_move]
    deficits = [
        jnp.clip(num_sims + 1.0 - d["start_visits"], 0.0, None) for d in per_move
    ]
    occ = [
        float(jnp.mean(df) / jnp.maximum(jnp.max(df), 1.0)) for df in deficits
    ]
    total_rounds = sum(rounds)
    visits_delivered = B * num_sims * moves
    rows_submitted = B * total_rounds
    reuse_saved = [
        float(jnp.mean(num_sims + 1.0 - df)) for df in deficits
    ]
    return {
        "batch_size": B,
        "num_sims": num_sims,
        "moves": moves,
        "rounds_per_move": rounds,
        "occupancy_per_move": [round(o, 4) for o in occ],
        "mean_occupancy_reused": round(sum(occ[1:]) / max(len(occ) - 1, 1), 4),
        "nn_rows_submitted": rows_submitted,
        "visits_delivered": visits_delivered,
        "visits_per_nn_row": round(visits_delivered / max(rows_submitted, 1), 4),
        "mean_reused_visits": [round(r, 1) for r in reuse_saved],
        "wall_s_reused_moves": round(wall_reused, 3),
        "nn_rows_per_sec": round(B * sum(rounds[1:]) / wall_reused, 1),
    }


def flops_accounting(
    seg_compiled,
    nn_compiled,
    nn_rows: int,
    seg_wall_s: float,
    seg_visits: float,
) -> dict[str, Any]:
    """XLA cost-model FLOP/byte accounting for one compiled selfplay segment
    plus the bare NN forward at the same batch width. seg_wall_s must be a
    forced-fetch wall measurement of ONE segment execution."""
    seg = cost_analysis(seg_compiled)
    nn = cost_analysis(nn_compiled)
    peak_flops, peak_hbm = device_peaks()
    out = {
        "segment_flops": seg.get("flops"),
        "segment_bytes_accessed": seg.get("bytes_accessed"),
        "nn_forward_flops_per_row": (nn.get("flops") or 0.0) / max(nn_rows, 1),
        "device_kind": jax.devices()[0].device_kind,
        "peak_bf16_flops": peak_flops,
        "peak_hbm_bytes_per_s": peak_hbm,
    }
    if seg.get("flops") and seg_wall_s > 0:
        achieved = seg["flops"] / seg_wall_s
        out["achieved_flops_per_s"] = round(achieved, 1)
        if peak_flops:
            out["mfu"] = round(achieved / peak_flops, 5)
    if seg.get("bytes_accessed") and seg_wall_s > 0:
        bw = seg["bytes_accessed"] / seg_wall_s
        out["xla_bytes_per_s"] = round(bw, 1)
        if peak_hbm:
            # upper bound: XLA's 'bytes accessed' counts operand+result bytes
            # of every op, much of which stays in registers/VMEM after fusion
            out["hbm_utilization_upper_bound"] = round(bw / peak_hbm, 5)
    return out
