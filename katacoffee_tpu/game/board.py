"""Pure-functional, vectorizable Coffee game rules in JAX.

Semantics match the reference engine (KataCoffee `cpp/game/board.{h,cpp}`,
`cpp/game/boardhistory.{h,cpp}`), re-designed as fixed-shape array ops so that
thousands of games step in lockstep under `jit`/`vmap` on TPU.

The game ("Coffee", 2011): players alternate placing stones on an X×Y board
(default 5×5). A *move* is a Spot (cell) plus a Direction, one of four line
orientations: N `|` (vertical), W `—` (horizontal), NW `\\` (main diagonal),
NE `/` (anti-diagonal) — reference `board.h:40-48`.

Legality of move (spot, dir) for the player to move (reference
`board.cpp:185-227`, with the reference's duplicate-variable compile bug at
`board.cpp:214-226` repaired to its clear intent):
  (a) the spot is empty;
  (b) the spot lies on the line through the previous move's spot along the
      previous move's direction (N → same column, W → same row, NW → dx==dy,
      NE → dx==-dy); no constraint on the first move (D_NONE);
  (c) scanning the full line through `spot` along ±`dir` (walls stop the scan,
      stones do NOT), some cell other than `spot` is empty — i.e. the
      opponent, constrained to that line, will have at least one empty cell.

The game ends the moment the mover completes a run of `win_len` stones through
the spot just played (`board.cpp:376-383`, `boardhistory.cpp:171-175`); the
mover wins. The reference leaves the no-legal-move case undefined (it relies
on maxMovesPerGame); we define it: if the player to move has no legal move,
the game ends immediately as a draw (winner = C_EMPTY). This is reachable
(e.g. exactly one empty cell remaining fails (c) for every direction).

Coffee has no captures, so positions never repeat within a game; the full
search-relevant state is (stones, lastLoc, player-to-move) and the
transposition hash is a plain Zobrist over those (no KataGo GraphHash
path-class machinery is needed — see `situation_hash`).

Conventions:
  * Directions are indexed 0=N, 1=W, 2=NW, 3=NE, 4=NONE (`board.h:42-47`).
    As (dy,dx) unit offsets: N=(-1,0), W=(0,-1), NW=(-1,-1), NE=(-1,+1)
    (reference ADJ1..ADJ4, `board.cpp:82-85`).
  * A flat "spot" index is y*x_size + x (no wall border — the reference's
    padded (x+1)+(y+1)*(x_size+1) array exists only to make C scans cheap).
  * A flat policy "pos" is dir*(Y*X) + y*X + x, dir-major, matching reference
    `NNPos::xydToPos` (`nninputs.cpp:6-8`). There is no pass move.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Players / colors (reference board.h:28-38)
P_BLACK = 1
P_WHITE = 2
C_EMPTY = 0

# Directions (reference board.h:42-48)
D_NORTH = 0
D_WEST = 1
D_NORTHWEST = 2
D_NORTHEAST = 3
D_NONE = 4
NUM_DIRECTIONS = 4  # actual move directions; D_NONE is only a "no last move" marker

# (dy, dx) unit offsets per direction, matching reference ADJ1..ADJ4.
DIR_OFFSETS = ((-1, 0), (0, -1), (-1, -1), (-1, 1))

MAX_LEN = 10  # reference COMPILE_MAX_BOARD_LEN (board.h:14-16)


class GameConfig(NamedTuple):
    """Static (compile-time) game parameters. Hashable; close over it in jit."""

    x_size: int = 5
    y_size: int = 5
    win_len: int = 4

    @property
    def area(self) -> int:
        return self.x_size * self.y_size

    @property
    def policy_size(self) -> int:
        return self.x_size * self.y_size * NUM_DIRECTIONS


# Number of recent moves kept in the state; the NN input features need the
# last 5 moves (reference nninputs.cpp:560-628) and BoardHistory keeps 6
# recent boards (boardhistory.h:21).
NUM_RECENT_MOVES = 6


class GameState(NamedTuple):
    """Single-game state; every leaf is a fixed-shape array so a batch of
    games is just this pytree with a leading [B] axis (via vmap or manual
    batching)."""

    board: jax.Array  # int8 [Y, X]; 0 empty, 1 black, 2 white
    to_move: jax.Array  # int8 scalar; 1 or 2
    last_spot: jax.Array  # int32 scalar; flat y*X+x, -1 if no move yet
    last_dir: jax.Array  # int32 scalar; 0..3, D_NONE(4) if no move yet
    done: jax.Array  # bool scalar
    winner: jax.Array  # int8 scalar; 0 = none yet / draw
    num_turns: jax.Array  # int32 scalar
    recent_spots: jax.Array  # int32 [NUM_RECENT_MOVES]; [0]=last move, -1 = none
    recent_dirs: jax.Array  # int32 [NUM_RECENT_MOVES]
    stone_hash: jax.Array  # uint32 [2]; Zobrist over stones only


# ---------------------------------------------------------------------------
# Zobrist tables (host-generated once, deterministic; device-resident u32x2).
# The reference derives its tables from its own seeded PRNG (board.cpp:134);
# hash *values* are not part of the behavioral spec, only hash *distinctness*,
# so we use our own fixed-seed tables.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _zobrist_np(x_size: int, y_size: int):
    rng = np.random.RandomState(0xC0FFEE)
    area = x_size * y_size
    stones = rng.randint(0, 2**32, size=(area, 2, 2), dtype=np.uint64).astype(np.uint32)
    # last-loc hash: [area+1 (spot; last row = none), 5 (dir incl none), 2 words]
    lastloc = rng.randint(0, 2**32, size=(area + 1, 5, 2), dtype=np.uint64).astype(np.uint32)
    player = rng.randint(0, 2**32, size=(2, 2), dtype=np.uint64).astype(np.uint32)
    return stones, lastloc, player


def zobrist_tables(cfg: GameConfig):
    stones, lastloc, player = _zobrist_np(cfg.x_size, cfg.y_size)
    return jnp.asarray(stones), jnp.asarray(lastloc), jnp.asarray(player)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def init_state(cfg: GameConfig, to_move: int | jax.Array = P_BLACK) -> GameState:
    return GameState(
        board=jnp.zeros((cfg.y_size, cfg.x_size), dtype=jnp.int8),
        to_move=jnp.asarray(to_move, dtype=jnp.int8),
        last_spot=jnp.asarray(-1, dtype=jnp.int32),
        last_dir=jnp.asarray(D_NONE, dtype=jnp.int32),
        done=jnp.asarray(False),
        winner=jnp.asarray(0, dtype=jnp.int8),
        num_turns=jnp.asarray(0, dtype=jnp.int32),
        recent_spots=jnp.full((NUM_RECENT_MOVES,), -1, dtype=jnp.int32),
        recent_dirs=jnp.full((NUM_RECENT_MOVES,), D_NONE, dtype=jnp.int32),
        stone_hash=jnp.zeros((2,), dtype=jnp.uint32),
    )


# ---------------------------------------------------------------------------
# Geometry helpers (static per cfg — computed with numpy, closed over by jit)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _line_tables_np(x_size: int, y_size: int, win_len: int):
    """Precomputed constants that turn the rules' line scans into matmuls /
    table lookups (MXU-friendly; the scans the reference does cell-by-cell in
    C, board.cpp:185-227,315-383, become [B,area]@[area,·] contractions under
    vmap):
      * inc [4, area, area]: inc[d,i,j]=1 iff cell j lies on the maximal line
        through cell i along direction d (including i itself);
      * lastline [area+1, 5, area]: allowed-cell mask given (last_spot,
        last_dir); row area = "no last move" (all True), dir 4 likewise;
      * win_windows [nw, area]: all length-win_len straight windows;
      * exact window sets per L in {win_len-1, win_len-2, win_len-3}:
        (win [nw_L, area], boundary [nw_L, area]) — a window is an exact
        same-color run iff all its cells are the color and no boundary cell
        is (off-board boundaries are absent, i.e. walls end runs).
    """
    area = x_size * y_size
    ys, xs = np.mgrid[0:y_size, 0:x_size]

    def on(x, y):
        return 0 <= x < x_size and 0 <= y < y_size

    inc = np.zeros((4, area, area), np.float32)
    for d, (dy, dx) in enumerate(DIR_OFFSETS):
        for i in range(area):
            ix, iy = i % x_size, i // x_size
            inc[d, i, i] = 1.0
            for sign in (1, -1):
                cx, cy = ix + sign * dx, iy + sign * dy
                while on(cx, cy):
                    inc[d, i, cy * x_size + cx] = 1.0
                    cx += sign * dx
                    cy += sign * dy

    lastline = np.zeros((area + 1, 5, area), bool)
    lastline[area, :, :] = True
    lastline[:, 4, :] = True
    for s in range(area):
        lx, ly = s % x_size, s // x_size
        dxg = xs - lx
        dyg = ys - ly
        lastline[s, 0] = ((dxg == 0) & (dyg != 0)).reshape(-1)
        lastline[s, 1] = ((dyg == 0) & (dxg != 0)).reshape(-1)
        lastline[s, 2] = (dxg == dyg).reshape(-1)
        lastline[s, 3] = (dxg == -dyg).reshape(-1)

    def windows(L):
        """(window [nw, area], boundary [nw, area]) over all directions."""
        wins, bounds = [], []
        for d, (dy, dx) in enumerate(DIR_OFFSETS):
            for y0 in range(y_size):
                for x0 in range(x_size):
                    cells = [(x0 + k * dx, y0 + k * dy) for k in range(L)]
                    if not all(on(x, y) for x, y in cells):
                        continue
                    w = np.zeros((area,), np.float32)
                    for x, y in cells:
                        w[y * x_size + x] = 1.0
                    b = np.zeros((area,), np.float32)
                    for bx, by in ((x0 - dx, y0 - dy), (x0 + L * dx, y0 + L * dy)):
                        if on(bx, by):
                            b[by * x_size + bx] = 1.0
                    wins.append(w)
                    bounds.append(b)
        return np.stack(wins), np.stack(bounds)

    win_windows, _ = windows(win_len)
    exact = {}
    for L in range(max(win_len - 3, 1), win_len):
        exact[L] = windows(L)
    return inc, lastline, win_windows, exact


@functools.lru_cache(maxsize=None)
def _line_ids_np(x_size: int, y_size: int):
    """For each direction, an int map [Y, X] giving the id of the maximal
    board line through each cell in that direction, plus the number of lines.
    Lines partition the board per direction: N→columns, W→rows, NW→y-x
    diagonals, NE→y+x anti-diagonals."""
    ys, xs = np.mgrid[0:y_size, 0:x_size]
    ids = np.stack(
        [
            xs,  # N: same column
            ys,  # W: same row
            (ys - xs) + (x_size - 1),  # NW: main diagonals
            ys + xs,  # NE: anti-diagonals
        ]
    ).astype(np.int32)
    counts = (
        x_size,
        y_size,
        x_size + y_size - 1,
        x_size + y_size - 1,
    )
    return ids, counts


# ---------------------------------------------------------------------------
# Rules: legality
# ---------------------------------------------------------------------------


def line_empty_counts(cfg: GameConfig, board: jax.Array) -> jax.Array:
    """[4, Y, X] int32: for each direction d and cell c, the number of empty
    cells on the maximal line through c along d (including c itself if empty).
    Walls bound lines; stones do NOT break them (reference isLegal scans the
    full line past stones, board.cpp:213-226). Computed as one incidence-
    matrix contraction so the MXU does the scan (vmap batches it)."""
    inc, _, _, _ = _line_tables_np(cfg.x_size, cfg.y_size, cfg.win_len)
    inc = jnp.asarray(inc.reshape(4 * cfg.area, cfg.area))
    empty = (board == C_EMPTY).astype(jnp.float32).reshape(-1)
    counts = inc @ empty  # [4*area]
    return (counts + 0.5).astype(jnp.int32).reshape(4, cfg.y_size, cfg.x_size)


def _on_last_move_line(cfg: GameConfig, last_spot: jax.Array, last_dir: jax.Array) -> jax.Array:
    """[Y, X] bool: constraint (b) — cells on the line through the previous
    move's spot along its direction (precomputed table lookup; all-true when
    last_dir == D_NONE / no move yet). The previous spot itself is excluded
    by the reference's dy!=0 / dx!=0 same-cell conditions; occupied anyway,
    but we match exactly (board.cpp:194-209)."""
    _, lastline, _, _ = _line_tables_np(cfg.x_size, cfg.y_size, cfg.win_len)
    tab = jnp.asarray(lastline)
    spot_idx = jnp.where(last_spot < 0, cfg.area, last_spot)
    return tab[spot_idx, last_dir].reshape(cfg.y_size, cfg.x_size)


def legal_mask(cfg: GameConfig, state: GameState) -> jax.Array:
    """[4, Y, X] bool legal-move mask for the player to move.

    legal(d, c) = empty(c) ∧ on-last-line(c) ∧ (≥2 empty cells on the line
    through c along d — c itself plus at least one more). All false when the
    game is done."""
    empty = state.board == C_EMPTY
    on_line = _on_last_move_line(cfg, state.last_spot, state.last_dir)
    alive = line_empty_counts(cfg, state.board) >= 2
    mask = empty[None, :, :] & on_line[None, :, :] & alive
    return mask & jnp.logical_not(state.done)


def legal_mask_flat(cfg: GameConfig, state: GameState) -> jax.Array:
    """[4*Y*X] bool, dir-major flat policy layout (NNPos::xydToPos)."""
    return legal_mask(cfg, state).reshape(-1)


# ---------------------------------------------------------------------------
# Rules: runs and win detection
# ---------------------------------------------------------------------------


def _shift2d(arr: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """Shift a [Y, X] array so out[y, x] = arr[y+dy, x+dx], fill off-board."""
    y, x = arr.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(arr, ((py1, py0), (px1, px0)), constant_values=fill)
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (y, x))


def run_lengths(cfg: GameConfig, board: jax.Array) -> jax.Array:
    """[4, Y, X] int32: for each direction and cell, the length of the maximal
    run of cells with the *same color as that cell* through it along the
    direction (reference maxConsecutives walks ±dir, board.cpp:315-335).
    Computed for every cell including empty ones (recordMaxConsecutives does
    not skip empties either, board.cpp:336-375)."""
    kmax = max(cfg.x_size, cfg.y_size) - 1
    outs = []
    for dy, dx in DIR_OFFSETS:
        total = jnp.ones(board.shape, jnp.int32)
        for sign in (1, -1):
            carry = jnp.ones(board.shape, dtype=bool)
            for k in range(1, kmax + 1):
                # fill=-1 differs from every color, so off-board breaks runs
                neighbor = _shift2d(
                    board.astype(jnp.int32), sign * dy * k, sign * dx * k, -1
                )
                carry = carry & (neighbor == board.astype(jnp.int32))
                total = total + carry.astype(jnp.int32)
        outs.append(total)
    return jnp.stack(outs)


def per_cell_max_run(cfg: GameConfig, board: jax.Array) -> jax.Array:
    """[Y, X] int32 max over directions of run_lengths — the reference's
    recordMaxConsecutives per-cell longest-line target (board.cpp:336-375)."""
    return run_lengths(cfg, board).max(axis=0)


def _wins_at(cfg: GameConfig, board: jax.Array, spot: jax.Array) -> jax.Array:
    """bool: does the stone at flat `spot` sit in a run of >= win_len
    (reference checkGameEnd, board.cpp:376-383). A run of >= win_len exists
    through `spot` iff some length-win_len window containing `spot` is fully
    the spot's color — one windows-matrix contraction."""
    _, _, win_windows, _ = _line_tables_np(cfg.x_size, cfg.y_size, cfg.win_len)
    W = jnp.asarray(win_windows)  # [nw, area]
    flat = board.reshape(-1)
    color = flat[spot]
    is_c = (flat == color).astype(jnp.float32)
    full = (W @ is_c) >= (cfg.win_len - 0.5)  # [nw]
    contains = W[:, spot] > 0.5
    return jnp.any(full & contains) & (color != C_EMPTY)


def exact_run_mask(cfg: GameConfig, board: jax.Array, length: int) -> jax.Array:
    """[Y, X] bool: stones lying in a maximal same-color run of exactly
    `length` along some direction (the reference's exact-length line feature
    channels, nninputs.cpp:650-653, via precomputed window matrices)."""
    _, _, _, exact = _line_tables_np(cfg.x_size, cfg.y_size, cfg.win_len)
    if length not in exact:
        return jnp.zeros((cfg.y_size, cfg.x_size), bool)
    W, Bd = (jnp.asarray(a) for a in exact[length])
    flat = board.reshape(-1)
    marked = jnp.zeros((cfg.area,), bool)
    for color in (1, 2):
        is_c = (flat == color).astype(jnp.float32)
        full = ((W @ is_c) >= (length - 0.5)) & ((Bd @ is_c) < 0.5)  # [nw]
        member = (full.astype(jnp.float32) @ W) > 0.5  # [area]
        marked = marked | (member & (flat == color))
    return marked.reshape(cfg.y_size, cfg.x_size)


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------


def step(cfg: GameConfig, state: GameState, action: jax.Array) -> GameState:
    """Apply a flat dir-major policy action (dir*Y*X + y*X + x), assumed legal.

    Mirrors playMoveAssumeLegal + BoardHistory::makeBoardMoveAssumeLegal
    (board.cpp:427-435, boardhistory.cpp:157-176), plus our frozen
    no-legal-move→draw rule. If the game is already done, the step is a no-op.
    """
    area = cfg.area
    action = action.astype(jnp.int32)
    direction = action // area
    spot = action % area
    y = spot // cfg.x_size
    x = spot % cfg.x_size

    mover = state.to_move
    new_board = state.board.at[y, x].set(mover.astype(jnp.int8))

    stones, lastloc_tab, player_tab = zobrist_tables(cfg)
    new_hash = state.stone_hash ^ stones[spot, mover.astype(jnp.int32) - 1]

    won = _wins_at(cfg, new_board, spot)

    new_recent_spots = jnp.concatenate([spot[None], state.recent_spots[:-1]])
    new_recent_dirs = jnp.concatenate([direction[None], state.recent_dirs[:-1]])

    nxt = GameState(
        board=new_board,
        to_move=(3 - mover).astype(jnp.int8),  # getOpp (board.h:50-52)
        last_spot=spot,
        last_dir=direction,
        done=won,
        winner=jnp.where(won, mover, 0).astype(jnp.int8),
        num_turns=state.num_turns + 1,
        recent_spots=new_recent_spots,
        recent_dirs=new_recent_dirs,
        stone_hash=new_hash,
    )

    # Frozen rule: opponent with no legal reply -> immediate draw. (The
    # reference never defines this; SURVEY.md §2.1 flags it as a decision.)
    has_reply = jnp.any(legal_mask(cfg, nxt))
    stuck = jnp.logical_not(won) & jnp.logical_not(has_reply)
    nxt = nxt._replace(done=nxt.done | stuck)

    # If the game was already over, ignore the move entirely.
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(state.done, old, new), state, nxt
    )


# ---------------------------------------------------------------------------
# Hashing
# ---------------------------------------------------------------------------


def situation_hash(cfg: GameConfig, state: GameState) -> jax.Array:
    """uint32[2] hash of the full search-relevant state: stones ⊕ player to
    move ⊕ lastLoc. Unlike Go, Coffee never repeats a position within a game
    (stones are only added), so this plain situation hash is already a sound
    transposition key — the reference's GraphHash path-class chain
    (graphhash.cpp:14-44) exists for repetition safety that cannot arise here.
    lastLoc must be included because legality depends on it (board.cpp:190+).
    """
    _, lastloc_tab, player_tab = zobrist_tables(cfg)
    spot_idx = jnp.where(state.last_spot < 0, cfg.area, state.last_spot)
    h = state.stone_hash
    h = h ^ player_tab[state.to_move.astype(jnp.int32) - 1]
    h = h ^ lastloc_tab[spot_idx, state.last_dir]
    return h
