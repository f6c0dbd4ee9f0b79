"""NN input feature encoder — the jitted, vectorizable equivalent of the
reference's NNInputs::fillRowV1 (`cpp/neuralnet/nninputs.cpp:508-657`).

Layout frozen at 18 spatial + 1 global channels (docs/DESIGN.md decision 3;
the reference's own constant/README/code disagree 16/15/18):

  ch 0      on-board (all ones at fixed board size; kept for rectangular grids)
  ch 1, 2   stones of player-to-move / opponent
  ch 3-6    last move, one-hot over its direction (N/W/NW/NE), at its spot
  ch 7-10   moves 2,3,4,5 ago — spot only (historyChannelWithDirection=false,
            the reference default, nninputs.cpp:4)
  ch 11-14  legal-move mask for the player to move, per direction
            (indexed by NN pos — the reference's spot/pos bug repaired,
            decision 4)
  ch 15-17  cells lying in a maximal same-color run of exact length
            win_len-1, win_len-2, win_len-3 (intent semantics, decision 5)

  global 0  win_len (nninputs.cpp:656)

History channels follow the reference's alternating-player gating
(nninputs.cpp:577-628): the chain of channels 7..10 is included only as long
as moves strictly alternate players back from the current player; in real
games they always alternate, but when a position is set up mid-game the chain
can be cut short. Our state stores only (spot, dir) of recent moves; the
alternation is implied, but the chain must also stop when fewer than k moves
exist — handled by the -1 sentinel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from katacoffee_tpu.game.board import (
    C_EMPTY,
    D_NONE,
    GameConfig,
    GameState,
    NUM_DIRECTIONS,
    exact_run_mask,
    legal_mask,
)

NUM_FEATURES_SPATIAL = 18
NUM_FEATURES_GLOBAL = 1


def mask_history_state(state: GameState, keep: jax.Array) -> GameState:
    """Truncate a state's visible move history to its last `keep` (0..5)
    moves — the Coffee form of the reference's random history masking
    (useHist0..4 flags, trainingwrite.cpp:438-448, applied as input-plane
    masks in python/data_processing_pytorch.py:128-201).

    In Coffee the last move also constrains LEGALITY (the direction line,
    board.cpp:185-227), so masking must rewrite the state, not just feature
    planes: keep == 0 clears last_spot/last_dir too, making the state
    identical to one set up position-only (GTP set_position / analysis /
    startposes) — exactly the inputs the masking is meant to calibrate the
    net for. keep >= 1 keeps the last move (and its legality constraint) and
    hides moves further back, matching the reference's per-plane truncation.
    `keep` is a traced int32 scalar; vmap for a batch."""
    idx = jnp.arange(state.recent_spots.shape[0])
    vis = idx < keep
    has_last = keep > 0
    return state._replace(
        last_spot=jnp.where(has_last, state.last_spot, -1),
        last_dir=jnp.where(has_last, state.last_dir, jnp.int32(D_NONE)),
        recent_spots=jnp.where(vis, state.recent_spots, -1),
        recent_dirs=jnp.where(vis, state.recent_dirs, jnp.int32(D_NONE)),
    )


def sample_history_levels(rng: jax.Array, n: int, keep_prob: float = 0.98):
    """Per-row history depths with the reference's chained draw
    (trainingwrite.cpp:438-443): depth >= k with probability keep_prob^k,
    capped at the 5 stored moves. Returns int32 [n] in 0..5."""
    u = jax.random.uniform(rng, (n, 5))
    return jnp.cumprod((u < keep_prob).astype(jnp.int32), axis=1).sum(axis=1)


@jax.named_scope("ph_features")
def extract_features(cfg: GameConfig, state: GameState):
    """Returns (spatial [18, Y, X] float32, global [1] float32) for the player
    to move. vmap over a batch of states for [B, 18, Y, X]."""
    Y, X = cfg.y_size, cfg.x_size
    area = cfg.area
    pla = state.to_move
    opp = (3 - pla).astype(state.board.dtype)

    board = state.board
    onboard = jnp.ones((Y, X), jnp.float32)
    own = (board == pla).astype(jnp.float32)
    other = (board == opp).astype(jnp.float32)

    # ch3-6: last move one-hot by direction at its spot
    last = jnp.zeros((NUM_DIRECTIONS, area), jnp.float32)
    has_last = state.recent_spots[0] >= 0
    safe_spot = jnp.maximum(state.recent_spots[0], 0)
    last = last.at[state.recent_dirs[0], safe_spot].add(
        jnp.where(has_last, 1.0, 0.0)
    )
    last = last.reshape(NUM_DIRECTIONS, Y, X)

    # ch7-10: moves 2..5 ago, spot only; channel k-2 active iff at least k
    # moves have been made (alternation is implicit in real play).
    hist = []
    for k in range(1, 5):  # recent index 1..4 = moves 2..5 ago
        spot_k = state.recent_spots[k]
        present = spot_k >= 0
        plane = jnp.zeros((area,), jnp.float32).at[jnp.maximum(spot_k, 0)].add(
            jnp.where(present, 1.0, 0.0)
        )
        hist.append(plane.reshape(Y, X))
    hist = jnp.stack(hist)

    # ch11-14: legal moves per direction (pos-indexed; decision 4)
    legal = legal_mask(cfg, state).astype(jnp.float32)

    # ch15-17: exact-length runs of stones, lengths win_len-1 .. win_len-3
    # (window-matrix contractions, board.exact_run_mask)
    lines = jnp.stack(
        [
            exact_run_mask(cfg, board, L).astype(jnp.float32)
            for L in range(cfg.win_len - 1, cfg.win_len - 4, -1)
        ]
    )

    spatial = jnp.concatenate(
        [onboard[None], own[None], other[None], last, hist, legal, lines], axis=0
    )
    glob = jnp.asarray([float(cfg.win_len)], jnp.float32)
    return spatial, glob
