"""Tree-position recording: extra training rows from interior search-tree
nodes (the reference's `recordTreePositions`, play.cpp:710-855, knobs
`playsettings.h:62-64`; gated at play.cpp:1348-1365 on
`recordTreePositions && recordTreeTargetWeight > 0`).

Reference semantics, mirrored exactly:
  * after each move's search, walk the tree to depth <= 5 following the
    pla/opp "always best" flag alternation (recordTreePositionsRec,
    play.cpp:710-815): at a node with flags (p, o), child i gets
    (newP, newO) = (o, p && i == bestByVisits); recursion continues only
    where newP || newO and the child's NODE visits >= recordTreeThreshold;
  * a node is recorded iff its p flag is set, it is not the root, and it
    has at least one child (the numChildren <= 0 early return at
    play.cpp:731) — i.e. every move made by the player to move at the
    recorded position was the best-visits choice at its turn;
  * at the root only, the actually-played move and this turn's
    side-position fork move are excluded from the walk entirely
    (excludeLoc0/excludeLoc1, play.cpp:780-782 / 1362-1364);
  * each recorded position becomes a side-position-style row: policy
    target from the node's play-selection values (plain edge-scaled child
    weights — the root-only retrospective reduction does not apply,
    searchresults.cpp:140 `&node == rootNode`), value target from the
    node's searched value, row weight = recordTreeTargetWeight, no
    game-outcome aux targets (trainingwrite side-position path).

TPU deviations (documented): the recursion is evaluated level-synchronously
with a static per-level frontier cap and a static per-(game, move) output
capacity, overflow dropped lowest-visits-first — exact whenever at most
`frontier_cap` children qualify per level, which any practical
recordTreeThreshold guarantees (the knob is default-off and has no config
key in the reference; loadable here via recordTreePositions=true).
Best-child ties break by action index order rather than the reference's
child-insertion order. Like this framework's side-position rows, tree rows
are emitted per flush window rather than held until the episode finishes
(the reference buffers them in FinishedGameData, play.cpp:746-752, purely
as a plumbing choice — the targets are self-contained search outputs with
no game-outcome component, so streaming them is data-equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.search import mcts
from katacoffee_tpu.search.mcts import S_DRAW, S_VISITS, S_WL, Tree

MAX_RECORD_DEPTH = 5  # play.cpp:833 "Don't go too deep recording"
FRONTIER_CAP = 8  # static per-level recursion width (TPU deviation)


def record_tree_positions(
    cfg: GameConfig,
    tree: Tree,
    exclude0: jax.Array,  # [B] int32 action (the played move); -1 = none
    exclude1: jax.Array,  # [B] int32 action (side fork move); -1 = none
    row_ok: jax.Array,  # [B] bool: this move's rows may be recorded at all
    threshold: int,
    capacity: int,
    frontier_cap: int = FRONTIER_CAP,
):
    """Returns (states, policy [B,M,A], value [B,M,3], valid [B,M]) for up
    to `capacity` recorded interior positions per game from this move's
    finished search tree. All one-off per-move work (a few [B,M]-indexed
    gathers + M one-hot einsums), negligible next to the search itself."""
    B, N, A = tree.children.shape
    M = capacity
    bidx = jnp.arange(B)
    has_child_map = (tree.children >= 0).any(-1)  # [B, N]

    # frontier: node ids [B, F], flags p/o [B, F], alive [B, F]
    F = frontier_cap
    f_nodes = jnp.zeros((B, F), jnp.int32)
    f_p = jnp.zeros((B, F), bool).at[:, 0].set(True)
    f_o = jnp.zeros((B, F), bool).at[:, 0].set(True)
    f_alive = jnp.zeros((B, F), bool).at[:, 0].set(row_ok)

    rec_ids = []  # per level: [B, M] candidate node ids
    rec_vis = []  # [B, M] their visits (selection priority); -1 invalid
    for depth in range(1, MAX_RECORD_DEPTH + 1):
        width = 1 if depth == 1 else F
        cand_node, cand_p, cand_o, cand_keep, cand_vis = [], [], [], [], []
        for w in range(width):
            n_w = f_nodes[:, w]
            cs = mcts._child_edge_stats(tree, bidx, n_w)
            has = cs["has"]
            cvis = cs["cvis"]  # child NODE visits (play.cpp:784 stats.visits)
            # best child by node visits, first-max tie-break (play.cpp:760-771)
            best = jnp.argmax(jnp.where(has, cvis, -1.0), -1)
            new_p = jnp.broadcast_to(f_o[:, w, None], (B, A))
            new_o = f_p[:, w, None] & (jnp.arange(A)[None, :] == best[:, None])
            keep = (
                f_alive[:, w, None]
                & has
                & (cvis >= float(threshold))
                & (new_p | new_o)
            )
            if depth == 1:
                # root-only exclusions (play.cpp:780-782)
                excl = (jnp.arange(A)[None, :] == exclude0[:, None]) | (
                    jnp.arange(A)[None, :] == exclude1[:, None]
                )
                keep &= ~excl
            cand_node.append(cs["cidx"])
            cand_p.append(new_p)
            cand_o.append(new_o)
            cand_keep.append(keep)
            cand_vis.append(cvis)
        cand_node = jnp.concatenate(cand_node, -1)  # [B, width*A]
        cand_p = jnp.concatenate(cand_p, -1)
        cand_o = jnp.concatenate(cand_o, -1)
        cand_keep = jnp.concatenate(cand_keep, -1)
        cand_vis = jnp.concatenate(cand_vis, -1)

        # record p-flagged kept candidates that have children of their own
        # (the numChildren <= 0 early return, play.cpp:731): top-M by visits
        rmask = cand_keep & cand_p
        rvis = jnp.where(rmask, cand_vis, -1.0)
        top_v, top_i = jax.lax.top_k(rvis, min(M, rvis.shape[-1]))
        top_ids = jnp.take_along_axis(cand_node, top_i, -1)
        top_ok = (top_v >= 0) & has_child_map[bidx[:, None], top_ids]
        pad = M - top_ids.shape[-1]
        if pad > 0:
            top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)))
            top_ok = jnp.pad(top_ok, ((0, 0), (0, pad)))
            top_v = jnp.pad(top_v, ((0, 0), (0, pad)), constant_values=-1.0)
        rec_ids.append(top_ids)
        rec_vis.append(jnp.where(top_ok, top_v, -1.0))

        if depth == MAX_RECORD_DEPTH:
            break
        # next frontier: top-F kept candidates by visits
        fvis = jnp.where(cand_keep, cand_vis, -1.0)
        nf_v, nf_i = jax.lax.top_k(fvis, min(F, fvis.shape[-1]))
        gather = lambda x: jnp.take_along_axis(x, nf_i, -1)
        f_nodes = gather(cand_node)
        f_p = gather(cand_p)
        f_o = gather(cand_o)
        f_alive = nf_v >= 0
        if f_nodes.shape[-1] < F:
            fpad = F - f_nodes.shape[-1]
            f_nodes = jnp.pad(f_nodes, ((0, 0), (0, fpad)))
            f_p = jnp.pad(f_p, ((0, 0), (0, fpad)))
            f_o = jnp.pad(f_o, ((0, 0), (0, fpad)))
            f_alive = jnp.pad(f_alive, ((0, 0), (0, fpad)))

    # merge levels -> final top-M recorded nodes per game
    all_ids = jnp.concatenate(rec_ids, -1)  # [B, 5M]
    all_vis = jnp.concatenate(rec_vis, -1)
    _, sel = jax.lax.top_k(all_vis, M)
    ids = jnp.take_along_axis(all_ids, sel, -1)  # [B, M]
    valid = jnp.take_along_axis(all_vis, sel, -1) >= 0

    # --- row payloads ---------------------------------------------------
    ids_safe = jnp.where(valid, ids, 0)
    # policy target: normalized edge-scaled child weights of each node
    pts = []
    for m in range(M):
        cs = mcts._child_edge_stats(tree, bidx, ids_safe[:, m])
        w = cs["w"]
        tot = w.sum(-1, keepdims=True)
        pts.append(jnp.where(tot > 0, w / jnp.maximum(tot, 1e-12), 0.0))
    policy = jnp.stack(pts, 1)  # [B, M, A]
    # rows whose node has no weighted children carry no target
    valid = valid & (policy.sum(-1) > 0)

    # value target from the node's searched value, node-mover perspective
    # (extractValueTargets, play.cpp:674-698), in the side-position row form
    node_stats = tree.stats[bidx[:, None], ids_safe]  # [B, M, 8]
    wl = node_stats[..., S_WL]
    draw = jnp.clip(node_stats[..., S_DRAW], 0.0, 1.0)
    win = jnp.clip((1.0 - draw + wl) * 0.5, 0.0, 1.0)
    loss = jnp.clip((1.0 - draw - wl) * 0.5, 0.0, 1.0)
    value = jnp.stack([win, loss, draw], -1)
    value = value / jnp.maximum(value.sum(-1, keepdims=True), 1e-8)

    states = jax.tree_util.tree_map(
        lambda x: x[bidx[:, None], ids_safe], tree.states
    )
    return states, policy, value, valid


def empty_tree_position_fields(cfg: GameConfig, tree_states, B: int):
    """Zero-capacity placeholders for the Trajectory fields when recording
    is off (static shapes keep the scan layout uniform)."""
    states = jax.tree_util.tree_map(lambda x: x[:, :0], tree_states)
    return dict(
        tree_pos_states=states,
        tree_pos_policy=jnp.zeros((B, 0, cfg.policy_size), jnp.float32),
        tree_pos_value=jnp.zeros((B, 0, 3), jnp.float32),
        tree_pos_valid=jnp.zeros((B, 0), bool),
    )


def tree_position_rows(cfg: GameConfig, settings, traj):
    """Flatten a Trajectory's recorded tree positions into side-position-
    style training rows (TrainingBatch): this-turn policy target + the
    node's searched value as value/TD target, weight =
    recordTreeTargetWeight, no opponent-policy and no game-outcome aux
    targets (trainingwrite.cpp side-position addRow semantics)."""
    from katacoffee_tpu.selfplay.actor import TrainingBatch

    T, B, M = traj.tree_pos_valid.shape
    R = T * B * M
    Y, X = cfg.y_size, cfg.x_size
    L = len(settings.td_coeffs)

    def flat(x):
        return x.reshape((R,) + x.shape[3:])

    vt = flat(traj.tree_pos_value)
    weight = flat(traj.tree_pos_valid).astype(jnp.float32) * float(
        settings.record_tree_target_weight
    )
    return TrainingBatch(
        states=jax.tree_util.tree_map(flat, traj.tree_pos_states),
        policy_target=flat(traj.tree_pos_policy),
        opponent_policy_target=jnp.zeros((R, cfg.policy_size), jnp.float32),
        value_target=vt,
        td_value_targets=jnp.broadcast_to(vt[:, None, :], (R, L, 3)),
        ownership_target=jnp.zeros((R, Y, X), jnp.float32),
        line_target=jnp.zeros((R, Y, X), jnp.int32),
        futurepos_target=jnp.zeros((R, 2, Y, X), jnp.float32),
        var_time_left_target=jnp.zeros((R,), jnp.float32),
        shortterm_value_target=jnp.zeros((R,), jnp.float32),
        weight=weight,
        opponent_policy_weight=jnp.zeros((R,), jnp.float32),
        aux_weight=jnp.zeros((R,), jnp.float32),
    )
