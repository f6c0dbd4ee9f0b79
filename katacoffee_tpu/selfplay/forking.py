"""Whole-game forking for opening diversity (Play::maybeForkGame,
/root/reference/cpp/program/play.cpp:1741-1827, knobs playsettings.h:29-35,
enabled at the selfplay op point, configs/training/selfplay1.cfg:26-33) and
hint-position forks (Play::maybeHintForkGame, play.cpp:1830-1866).

Reference semantics: when a game finishes, with prob `earlyForkGameProb` pick
a move index ~ floor(Exponential() * area * earlyForkGameExpectedMoveProp)
(else with prob `forkGameProb` a uniform index over the whole game), replay to
that position, sample numChoices ∈ [forkGameMinChoices, maxChoices] random
legal moves (with replacement, PlayUtils::chooseRandomLegalMoves,
playutils.cpp:34-60), play the one the value net likes best for the mover,
and queue the resulting position; future games pop queued positions and play
them out as normal weight-bearing games (GameRunner::runGame,
play.cpp:1921-1925 — forked starts take priority over startposes and skip
policy-initialized openings). Hint forks: when a hint-position episode did
NOT open with its hint move, queue the position after the hint move so the
net gets to see the line it was hinted at (play.cpp:1836-1865).

TPU inversion: fork CANDIDATES are spotted on the host at data-flush time by
scanning the finalized trajectory window (episodes fully inside the window —
the lockstep analogue of "when a game finishes"), the NN move choice runs as
ONE batched device call over all candidates × choice lanes
(`choose_fork_moves`), and the resulting positions live in a fixed-capacity
`ForkPool` that the jitted selfplay segment consumes in-graph whenever
episodes reset (`actor.run_selfplay_segment`). The pool is a traced argument,
so refills never recompile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import (
    GameConfig,
    GameState,
    init_state,
    legal_mask_flat,
    step,
)


class ForkPool(NamedTuple):
    """Queued fork start positions — the reference's ForkData::forks
    (play.h:38-46). Fixed capacity so it can be threaded through jit."""

    states: GameState  # [Kf, ...]
    valid: jax.Array  # [Kf] bool


def init_fork_pool(cfg: GameConfig, capacity: int) -> ForkPool:
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(capacity))
    return ForkPool(states=states, valid=jnp.zeros((capacity,), bool))


def choose_fork_moves(
    cfg: GameConfig,
    eval_fn,
    states: GameState,  # [K] fork-from positions
    valid: jax.Array,  # [K] bool
    max_choices: jax.Array,  # [K] int32 (early vs late fork budget)
    forced: jax.Array,  # [K] int32 action, -1 = choose via the value net
    rng: jax.Array,
    min_choices: int = 3,
    num_lanes: int = 36,
) -> ForkPool:
    """The NN-assisted fork-move choice (play.cpp:1779-1822), batched: for
    each candidate position sample numChoices ∈ [min_choices, max_choices[k]]
    random legal moves with replacement, evaluate every child in one forward,
    and play the move whose child value is best for the mover. `forced` >= 0
    plays that exact move instead (hint forks, play.cpp:1857-1859; invalid if
    illegal). Returns fork positions with validity (finished children are
    dropped, play.cpp:1823-1826). jit with static cfg/eval_fn/min/num_lanes."""
    K = valid.shape[0]
    A = cfg.policy_size
    k_n, k_lanes, k_eval = jax.random.split(rng, 3)

    legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)  # [K, A]
    any_legal = legal.any(-1)

    # numChoices = gameRand.nextInt(min, max) — uniform inclusive
    # (play.cpp:1789)
    span = jnp.maximum(max_choices - min_choices + 1, 1)
    u = jax.random.uniform(k_n, (K,))
    num_choices = min_choices + jnp.floor(u * span).astype(jnp.int32)

    # lane moves: uniform over legal, WITH replacement (playutils.cpp:52-56)
    logits = jnp.where(legal, 0.0, -jnp.inf)
    lane_moves = jax.random.categorical(
        k_lanes, logits[:, None, :], axis=-1, shape=(K, num_lanes)
    ).astype(jnp.int32)
    lane_moves = jnp.where(any_legal[:, None], lane_moves, 0)
    lane_ok = jnp.arange(num_lanes)[None, :] < num_choices[:, None]

    # step + evaluate every (candidate, lane) child in one batch
    rep = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(
            x[:, None], (K, num_lanes) + x.shape[1:]
        ).reshape((K * num_lanes,) + x.shape[1:]),
        states,
    )
    children = jax.vmap(functools.partial(step, cfg))(rep, lane_moves.reshape(-1))
    res = eval_fn(children, k_eval)
    # child mover is the opponent; mover's winrate = -child wl (negamax
    # convention, CLAUDE.md) — the reference compares whiteWinrate with the
    # comparison flipped by pla (play.cpp:1810-1816)
    score = (-res.wl).reshape(K, num_lanes)
    score = jnp.where(lane_ok, score, -jnp.inf)
    best_lane = jnp.argmax(score, axis=-1)
    chosen = lane_moves[jnp.arange(K), best_lane]

    use_forced = forced >= 0
    forced_safe = jnp.maximum(forced, 0)
    forced_legal = legal[jnp.arange(K), forced_safe]
    move = jnp.where(use_forced, forced_safe, chosen)

    fork_states = jax.vmap(functools.partial(step, cfg))(states, move)
    ok = valid & ~fork_states.done & jnp.where(use_forced, forced_legal, any_legal)
    return ForkPool(states=fork_states, valid=ok)


def extract_fork_candidates(
    cfg: GameConfig,
    traj,
    rng: np.random.Generator,
    early_fork_prob: float = 0.04,
    early_fork_move_prop: float = 0.025,
    fork_prob: float = 0.01,
    early_max_choices: int = 12,
    fork_max_choices: int = 36,
):
    """Host-side scan of a finalized trajectory window for fork candidates
    (the per-finished-game draws of maybeForkGame, play.cpp:1752-1768, plus
    the hint-fork condition of maybeHintForkGame, play.cpp:1836-1841).

    `traj` is a host (numpy) Trajectory whose leading axes are [T, B]. Only
    episodes fully contained in the window are considered (documented
    deviation: the reference forks from every finished game; episodes
    spanning flush windows — a few percent at the recommended window size —
    are skipped along with their weight-0 rows).

    Returns (flat_idx, max_choices, forced) numpy arrays, where flat_idx
    indexes the [T*B]-flattened trajectory rows of the fork-from positions,
    or None when there are no candidates."""
    done = np.asarray(traj.done_after)  # [T, B]
    ep = np.asarray(traj.episode_id)
    nturns = np.asarray(traj.states.num_turns)
    played = np.asarray(traj.played_action)
    hint_action = np.asarray(traj.hint_action)
    T, B = done.shape
    area = cfg.x_size * cfg.y_size

    idxs, maxcs, forceds = [], [], []
    for b in range(B):
        t = 0
        while t < T:
            e = ep[t, b]
            end = None
            for u in range(t, T):
                if ep[u, b] != e:
                    break
                if done[u, b]:
                    end = u
                    break
            if end is None:
                break  # unfinished tail
            started_inside = t > 0 or nturns[t, b] == 0
            length = end - t + 1
            if started_inside:
                # hint fork: episode opened at a hint position but played a
                # different move (play.cpp:1836-1841)
                ha = int(hint_action[t, b])
                if ha >= 0 and int(played[t, b]) != ha:
                    idxs.append(t * B + b)
                    maxcs.append(0)
                    forceds.append(ha)
                # plain fork draws (play.cpp:1752-1768)
                if rng.random() < early_fork_prob:
                    m = int(np.floor(rng.exponential() * early_fork_move_prop * area))
                    if m < length:
                        idxs.append((t + m) * B + b)
                        maxcs.append(early_max_choices)
                        forceds.append(-1)
                elif fork_prob > 0 and rng.random() < fork_prob:
                    m = int(rng.integers(length))
                    idxs.append((t + m) * B + b)
                    maxcs.append(fork_max_choices)
                    forceds.append(-1)
            t = end + 1
    if not idxs:
        return None
    return (
        np.asarray(idxs, np.int64),
        np.asarray(maxcs, np.int32),
        np.asarray(forceds, np.int32),
    )


def refill_pool(pool: ForkPool, new: ForkPool) -> ForkPool:
    """Host-side merge: place `new`'s valid entries into `pool`'s invalid
    slots (numpy; overflow is dropped — the reference pool is unbounded but
    drains at the same average rate it fills)."""
    pool_states = jax.tree_util.tree_map(lambda x: np.array(x), pool.states)
    pool_valid = np.asarray(pool.valid).copy()
    new_states = jax.tree_util.tree_map(np.asarray, new.states)
    new_valid = np.asarray(new.valid)
    free = np.flatnonzero(~pool_valid)
    src = np.flatnonzero(new_valid)[: len(free)]
    dst = free[: len(src)]
    for leaf_dst, leaf_src in zip(
        jax.tree_util.tree_leaves(pool_states), jax.tree_util.tree_leaves(new_states)
    ):
        leaf_dst[dst] = leaf_src[src]
    pool_valid[dst] = True
    return ForkPool(
        states=jax.tree_util.tree_map(jnp.asarray, pool_states),
        valid=jnp.asarray(pool_valid),
    )
