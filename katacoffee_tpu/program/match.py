"""Batched match runner: two bots, B games in lockstep on device.

The role of the reference's `MatchPairer` + gatekeeper/match game loops
(`cpp/program/play.h:145-192`, `cpp/command/gatekeeper.cpp:451-545`,
`cpp/command/match.cpp`): play many games between two nets and tally results.

TPU design: colors alternate strictly in Coffee (no pass), so if the batch is
split into two static halves — half where bot A is black, half where bot B is
black — then at every ply each half needs exactly ONE bot's search, on a
static shape. Each ply therefore runs one batched search per bot on its half;
no ragged dispatch, no 2× waste. Finished games keep stepping as no-ops
(step() is a no-op on done states) until every game ends or the turn cap hits
(the reference's maxMovesPerGame, play.cpp:1262).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig, init_state, step
from katacoffee_tpu.search import mcts
from katacoffee_tpu.search.params import SearchParams


@dataclasses.dataclass
class MatchResult:
    games: int
    wins_a: int
    wins_b: int
    draws: int
    move_records: list  # per game: list of flat actions
    black_was_a: np.ndarray  # [B] bool
    winners: np.ndarray | None = None  # [B] 0 draw / 1 black / 2 white

    @property
    def score_a(self) -> float:
        return (self.wins_a + 0.5 * self.draws) / max(self.games, 1)


def _make_move_fn(cfg: GameConfig, sp: SearchParams, eval_fn, num_visits: int):
    """jitted: states[B'] -> chosen actions[B'] (search + select)."""

    def fn(states, rng):
        k1, k2 = jax.random.split(rng)
        tree = mcts.run_search(cfg, sp, eval_fn, states, num_visits, k1)
        return mcts.select_moves(cfg, sp, tree, k2)

    return jax.jit(fn)


def run_match(
    cfg: GameConfig,
    sp_a: SearchParams,
    sp_b: SearchParams,
    eval_a,
    eval_b,
    num_games: int,
    num_visits: int,
    seed: int = 0,
    max_moves: int | None = None,
    record_moves: bool = False,
) -> MatchResult:
    """Play `num_games` (rounded up to even) games, half with A as black.
    Bots may differ in both eval_fn and SearchParams."""
    B = num_games + (num_games % 2)
    half = B // 2
    max_moves = max_moves or (cfg.area + 2)

    move_a = _make_move_fn(cfg, sp_a, eval_a, num_visits)
    move_b = _make_move_fn(cfg, sp_b, eval_b, num_visits)
    vstep = jax.jit(jax.vmap(functools.partial(step, cfg)))

    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    black_was_a = np.zeros((B,), bool)
    black_was_a[:half] = True

    rng = jax.random.PRNGKey(seed)
    moves_by_game: list[list[int]] = [[] for _ in range(B)]

    def take(states, lo, hi):
        return jax.tree_util.tree_map(lambda x: x[lo:hi], states)

    for ply in range(max_moves):
        done = np.asarray(states.done)
        if done.all():
            break
        # ply parity decides which bot holds the color to move in each half:
        # half 1 (A=black) needs A on even plies; half 2 (B=black) the reverse
        rng, ka, kb = jax.random.split(rng, 3)
        if ply % 2 == 0:
            acts_1 = move_a(take(states, 0, half), ka)
            acts_2 = move_b(take(states, half, B), kb)
        else:
            acts_1 = move_b(take(states, 0, half), ka)
            acts_2 = move_a(take(states, half, B), kb)
        acts = jnp.concatenate([acts_1, acts_2])
        acts = jnp.where(states.done, 0, acts)
        if record_moves:
            aa = np.asarray(acts)
            for g in range(B):
                if not done[g]:
                    moves_by_game[g].append(int(aa[g]))
        states = vstep(states, acts)

    done = np.asarray(states.done)
    winner = np.asarray(states.winner)
    # unfinished games (turn cap) count as draws, like hitTurnLimit rows
    winner = np.where(done, winner, 0)
    a_color = np.where(black_was_a, 1, 2)
    wins_a = int((winner == a_color).sum())
    wins_b = int(((winner != 0) & (winner != a_color)).sum())
    draws = int((winner == 0).sum())
    return MatchResult(
        games=B,
        wins_a=wins_a,
        wins_b=wins_b,
        draws=draws,
        move_records=moves_by_game if record_moves else [],
        black_was_a=black_was_a,
        winners=winner,
    )


def match_sgfs(cfg: GameConfig, result: MatchResult, name_a: str, name_b: str) -> list[str]:
    """SGF texts for recorded games (requires record_moves=True)."""
    from katacoffee_tpu.dataio.sgf import write_sgf

    out = []
    for g, actions in enumerate(result.move_records):
        moves = []
        pla = 1
        for a in actions:
            d, spot = a // cfg.area, a % cfg.area
            moves.append((spot % cfg.x_size, spot // cfg.x_size, d, pla))
            pla = 3 - pla
        is_a_black = bool(result.black_was_a[g])
        bn = name_a if is_a_black else name_b
        wn = name_b if is_a_black else name_a
        winner = int(result.winners[g]) if result.winners is not None else None
        out.append(
            write_sgf(cfg.x_size, cfg.y_size, cfg.win_len, moves, bn, wn, winner=winner)
        )
    return out
