"""Dihedral-8 symmetry helpers for boards, feature planes, policies, states.

Encoding matches the reference (`nninputs.h:120-162`): a symmetry is 3 bits —
flipY (bit 0), flipX (bit 1), transpose (bit 2), applied in that order.
Non-square transposes are disallowed.

Directions transform as lines (repaired getSymDir, `nninputs.cpp:409-433` —
the reference falls through to assert(false) when the direction is unchanged;
see docs/DESIGN.md decision 7):
  * NE ↔ NW iff exactly one of flipX/flipY;
  * N ↔ W iff transpose;
  * otherwise unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import (
    D_NONE,
    GameConfig,
    GameState,
    NUM_DIRECTIONS,
    zobrist_tables,
)

NUM_SYMMETRIES = 8


def num_symmetries(cfg: GameConfig) -> int:
    """Usable dihedral symmetries for this board: 8 when square, 4 on
    rectangles (the transpose bit, syms 4-7, requires x_size == y_size —
    SymmetryHelpers does the same gating in the reference)."""
    return NUM_SYMMETRIES if cfg.x_size == cfg.y_size else 4


def is_flip_y(sym: int) -> bool:
    return (sym & 1) != 0


def is_flip_x(sym: int) -> bool:
    return (sym & 2) != 0


def is_transpose(sym: int) -> bool:
    return (sym & 4) != 0


def invert(sym: int) -> int:
    """Symmetries 5 and 6 are each other's inverses; the rest self-invert
    (nninputs.cpp:359-365)."""
    if sym == 5:
        return 6
    if sym == 6:
        return 5
    return sym


def compose(first: int, then: int) -> int:
    """Symmetry equal to applying `first`, then `then` (nninputs.cpp:367-371)."""
    if is_transpose(first):
        then = (then & 0x4) | ((then & 0x2) >> 1) | ((then & 0x1) << 1)
    return first ^ then


@functools.lru_cache(maxsize=None)
def dir_perm(sym: int) -> tuple:
    """perm[old_dir] = new_dir for the 4 actual directions (+D_NONE fixed)."""
    perm = list(range(NUM_DIRECTIONS)) + [D_NONE]
    if is_flip_x(sym) ^ is_flip_y(sym):
        perm[2], perm[3] = perm[3], perm[2]  # NW <-> NE
    if is_transpose(sym):
        perm[0], perm[1] = perm[1], perm[0]  # N <-> W
    return tuple(perm)


def apply_plane(sym: int, plane: jax.Array) -> jax.Array:
    """Apply to the trailing two (H, W) axes of an array."""
    if is_flip_y(sym):
        plane = jnp.flip(plane, axis=-2)
    if is_flip_x(sym):
        plane = jnp.flip(plane, axis=-1)
    if is_transpose(sym):
        assert plane.shape[-1] == plane.shape[-2], "non-square transpose"
        plane = jnp.swapaxes(plane, -1, -2)
    return plane


def apply_spot(cfg: GameConfig, sym: int, spot):
    """Flat spot index transform; -1 (none) maps to itself. Works on arrays."""
    x = spot % cfg.x_size
    y = spot // cfg.x_size
    if is_flip_x(sym):
        x = cfg.x_size - 1 - x
    if is_flip_y(sym):
        y = cfg.y_size - 1 - y
    if is_transpose(sym):
        assert cfg.x_size == cfg.y_size
        x, y = y, x
    out = y * cfg.x_size + x
    return jnp.where(spot < 0, spot, out)


def apply_direction(sym: int, direction):
    """Direction transform (works on traced arrays via table lookup)."""
    table = jnp.asarray(dir_perm(sym), dtype=jnp.int32)
    return table[direction]


def apply_policy(cfg: GameConfig, sym: int, policy: jax.Array) -> jax.Array:
    """Transform a dir-major flat policy-sized vector [..., 4*H*W]."""
    shp = policy.shape[:-1]
    p = policy.reshape(*shp, NUM_DIRECTIONS, cfg.y_size, cfg.x_size)
    p = apply_plane(sym, p)
    perm = dir_perm(sym)
    inv = [0] * NUM_DIRECTIONS
    for old, new in enumerate(perm[:NUM_DIRECTIONS]):
        inv[new] = old
    p = p[..., jnp.asarray(inv), :, :]
    return p.reshape(*shp, -1)


def apply_action(cfg: GameConfig, sym: int, action):
    """Transform a flat dir-major action index."""
    area = cfg.area
    direction = action // area
    spot = action % area
    return apply_direction(sym, direction) * area + apply_spot(cfg, sym, spot)


def apply_features(sym: int, spatial: jax.Array) -> jax.Array:
    """Transform the 18-channel feature tensor [..., 18, H, W]: spatial
    transform on every plane + direction-channel permutation on the last-move
    one-hot (ch3-6) and legal-move (ch11-14) groups."""
    spatial = apply_plane(sym, spatial)
    perm = dir_perm(sym)
    inv = [0] * NUM_DIRECTIONS
    for old, new in enumerate(perm[:NUM_DIRECTIONS]):
        inv[new] = old
    chans = list(range(spatial.shape[-3]))
    for base in (3, 11):
        group = [base + inv[d] for d in range(NUM_DIRECTIONS)]
        chans[base : base + NUM_DIRECTIONS] = group
    return spatial[..., jnp.asarray(chans), :, :]


def apply_state(cfg: GameConfig, sym: int, state: GameState) -> GameState:
    """Transform a full game state (board, last move, history, hash)."""
    board = apply_plane(sym, state.board)
    stones_tab, _, _ = zobrist_tables(cfg)
    flat = board.reshape(-1)
    black = (flat == 1).astype(jnp.uint32)
    white = (flat == 2).astype(jnp.uint32)
    # XOR-reduce zobrist entries of present stones; XOR of x with itself an
    # even number of times cancels, so multiply-by-{0,1} then xor-reduce works
    contrib = stones_tab[:, 0, :] * black[:, None] ^ stones_tab[:, 1, :] * white[:, None]
    stone_hash = jax.lax.reduce(
        contrib, jnp.zeros((), jnp.uint32), jax.lax.bitwise_xor, (0,)
    )
    return state._replace(
        board=board,
        last_spot=apply_spot(cfg, sym, state.last_spot),
        last_dir=apply_direction(sym, state.last_dir),
        recent_spots=apply_spot(cfg, sym, state.recent_spots),
        recent_dirs=apply_direction(sym, state.recent_dirs),
        stone_hash=stone_hash,
    )


def random_symmetry(key: jax.Array) -> jax.Array:
    return jax.random.randint(key, (), 0, NUM_SYMMETRIES)


def stabilizer(cfg: GameConfig, state: GameState) -> list[int]:
    """Host-side: the symmetries that fix a position (board + lastLoc) —
    the root stabilizer subgroup that rootSymmetryPruning prunes by and
    that analysis-row duplication re-expands by (the reference's
    rootSymmetries, searchresults.cpp:986-1012). Always contains 0."""
    board = np.asarray(state.board)
    last_spot = int(state.last_spot)
    last_dir = int(state.last_dir)
    syms = []
    for s in range(num_symmetries(cfg)):
        ts = apply_state(cfg, s, state)
        if not (np.asarray(ts.board) == board).all():
            continue
        if last_spot >= 0 and (
            int(ts.last_spot) != last_spot or int(ts.last_dir) != last_dir
        ):
            continue
        syms.append(s)
    return syms


def action_table(cfg: GameConfig):
    """[nsym, A] int32 numpy table of each flat action's image under each
    dihedral symmetry (cached)."""
    from katacoffee_tpu.search.mcts import _sym_action_table

    return _sym_action_table(cfg)
