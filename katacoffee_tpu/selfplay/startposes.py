"""Start positions for selfplay from SGF files.

The role of the reference's startposes machinery (`Sgf::PositionSample`,
GameInitializer startposes/hintposes sampling, play.h:69-142; configured by
startPosesProb / startPosesFromSgfDir / startPosesTurnWeightLambda,
selfplay1.cfg:37-41; the README "Custom SGF" feature): load positions from
SGF games — every prefix of the main line, plus pure-placement setups — and
have a fraction of selfplay episodes begin there instead of the empty board.

Sampling weights follow the reference's turn-weight lambda: position at turn
t of its game gets weight exp(-lambda * t) (startPosesTurnWeightLambda
semantics: 0 = uniform, positive = prefer early positions).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.dataio.sgf import parse_sgf_file
from katacoffee_tpu.game.board import GameConfig, GameState, init_state, step


def load_startposes(
    cfg: GameConfig,
    paths: list[str] | str,
    turn_weight_lambda: float = 0.0,
    max_positions: int = 4096,
    include_final: bool = False,
    with_hints: bool = False,
) -> tuple[GameState, np.ndarray] | tuple[GameState, np.ndarray, np.ndarray] | None:
    """Returns (states stacked [K], sampling probs [K]) or None if no
    usable positions. `paths` is a dir (recursed) or a list of SGF files.

    with_hints additionally returns hint actions [K] int32: the move the
    source game played FROM each position (-1 when none, e.g. placement
    setups) — the reference's hintposes (Sgf::PositionSample hintLoc, mined
    by dataminesgfs; consumed via hintPosesProb)."""
    if isinstance(paths, str):
        files = []
        for root, _dirs, names in os.walk(paths):
            files.extend(os.path.join(root, n) for n in sorted(names) if n.endswith(".sgf"))
    else:
        files = list(paths)

    states: list[GameState] = []
    weights: list[float] = []
    hints: list[int] = []
    step1 = jax.jit(lambda s, a: step(cfg, s, a))
    for path in files:
        try:
            sgf = parse_sgf_file(path)
        except (ValueError, OSError):
            continue
        if sgf.board_size() != (cfg.x_size, cfg.y_size) or sgf.win_len() != cfg.win_len:
            continue
        # placements-only setup (AB/AW with no moves): a single position
        placements = sgf.placements()
        moves = sgf.moves()
        if placements and not moves:
            board = np.zeros((cfg.y_size, cfg.x_size), np.int8)
            for x, y, pla in placements:
                board[y, x] = pla
            base = init_state(cfg)
            states.append(
                base._replace(
                    board=jnp.asarray(board),
                    num_turns=jnp.asarray(int((board != 0).sum()), jnp.int32),
                )
            )
            weights.append(1.0)
            hints.append(-1)
            continue
        s = init_state(cfg)
        for t, (x, y, d, _pla) in enumerate(moves):
            s = step1(s, jnp.asarray(d * cfg.area + y * cfg.x_size + x, jnp.int32))
            if bool(s.done):
                if include_final:
                    pass
                break
            states.append(s)
            weights.append(math.exp(-turn_weight_lambda * (t + 1)))
            # the hint for this position is the game's NEXT move
            if t + 1 < len(moves):
                hx, hy, hd, _ = moves[t + 1]
                hints.append(hd * cfg.area + hy * cfg.x_size + hx)
            else:
                hints.append(-1)
            if len(states) >= max_positions:
                break
        if len(states) >= max_positions:
            break

    if not states:
        return None
    pool = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    w = np.asarray(weights, np.float64)
    probs = (w / w.sum()).astype(np.float32)
    if with_hints:
        return pool, probs, np.asarray(hints, np.int32)
    return pool, probs
