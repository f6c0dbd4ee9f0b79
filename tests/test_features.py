"""Feature-encoder tests: layout pins for each channel group against the
frozen 18+1 spec (docs/DESIGN.md decision 3; reference nninputs.cpp:508-657)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state, jitted
from katacoffee_tpu.nn import (
    NUM_FEATURES_GLOBAL,
    NUM_FEATURES_SPATIAL,
    extract_features,
)

CFG = GameConfig(5, 5, 4)


@functools.lru_cache(maxsize=None)
def feat_fn(cfg):
    return jax.jit(functools.partial(extract_features, cfg))


def play(cfg, state, x, y, d):
    return jitted.step_fn(cfg)(
        state, jnp.asarray(d * cfg.area + y * cfg.x_size + x, jnp.int32)
    )


def test_shapes_and_initial_planes():
    state = init_state(CFG)
    spatial, glob = feat_fn(CFG)(state)
    assert spatial.shape == (NUM_FEATURES_SPATIAL, 5, 5)
    assert glob.shape == (NUM_FEATURES_GLOBAL,)
    s = np.asarray(spatial)
    assert (s[0] == 1).all()  # on-board
    assert (s[1] == 0).all() and (s[2] == 0).all()  # no stones
    assert (s[3:7] == 0).all()  # no last move
    assert (s[7:11] == 0).all()  # no history
    # legal-move channels match legal_mask
    np.testing.assert_array_equal(
        s[11:15], np.asarray(jitted.legal_mask_fn(CFG)(state)).astype(np.float32)
    )
    assert (s[15:18] == 0).all()  # no runs on empty board
    assert float(glob[0]) == 4.0


def test_stone_and_last_move_planes_flip_perspective():
    cfg = CFG
    state = init_state(cfg)
    state = play(cfg, state, 2, 2, 0)  # black C3 dir N
    s = np.asarray(feat_fn(cfg)(state)[0])
    # Now white to move: black stone appears in the *opponent* plane ch2
    assert s[2][2, 2] == 1 and s[1].sum() == 0
    # last move channel: dir N = ch3, at (2,2)
    assert s[3][2, 2] == 1 and s[3].sum() == 1
    assert (s[4:7] == 0).all()
    state = play(cfg, state, 2, 0, 1)  # white (2,0) dir W
    s = np.asarray(feat_fn(cfg)(state)[0])
    # black to move: own plane has black stone, opp has white
    assert s[1][2, 2] == 1 and s[2][0, 2] == 1
    # last move = white's, dir W = ch4 at (0-row,2-col) -> s[4][0,2]
    assert s[4][0, 2] == 1 and s[4].sum() == 1
    # move 2 ago (black's) spot-only plane ch7 at (2,2)
    assert s[7][2, 2] == 1 and s[7].sum() == 1
    assert (s[8:11] == 0).all()


def test_history_chain_depth():
    cfg = CFG
    state = init_state(cfg)
    # play 5 moves and verify ch7..10 fill in order
    moves = [(2, 2, 0), (2, 0, 1), (4, 0, 0), (4, 3, 1), (0, 3, 0)]
    spots = []
    for x, y, d in moves:
        state = play(cfg, state, x, y, d)
        spots.append((x, y))
    s = np.asarray(feat_fn(cfg)(state)[0])
    # last move ch3+d at moves[-1]
    x, y, d = moves[-1]
    assert s[3 + d][y, x] == 1
    # ch7 = 2 moves ago ... ch10 = 5 moves ago
    for k in range(2, 6):
        xk, yk = spots[-k]
        assert s[7 + (k - 2)][yk, xk] == 1, k
        assert s[7 + (k - 2)].sum() == 1


def test_line_channels_mark_exact_runs():
    cfg = CFG
    state = init_state(cfg)
    # black: (0,0) then build a horizontal pair on row 4 for white etc. Use a
    # direct board: 3 black in a row => exact length 3 = win_len-1 -> ch15
    board = jnp.zeros((5, 5), jnp.int8)
    for x in range(3):
        board = board.at[2, x].set(1)
    state = init_state(cfg)._replace(board=board)
    s = np.asarray(feat_fn(cfg)(state)[0])
    for x in range(3):
        assert s[15][2, x] == 1  # exact run of 3 = win_len-1
    assert s[15].sum() == 3
    # each stone is also in vertical/diagonal runs of exactly 1 = win_len-3
    assert s[17][2, 0] == 1
    # pairs (win_len-2=2): none
    assert s[16].sum() == 0
    # empty cells never marked
    assert s[15:18][:, 0, :].sum() == 0


def test_features_vmap():
    cfg = CFG
    B = 8
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    vfeat = jax.jit(jax.vmap(functools.partial(extract_features, cfg)))
    spatial, glob = vfeat(states)
    assert spatial.shape == (B, NUM_FEATURES_SPATIAL, 5, 5)
    assert glob.shape == (B, NUM_FEATURES_GLOBAL)


def test_history_mask_matches_set_position():
    """A fully history-masked row's features equal a freshly set-up
    position-only state's features (the calibration target of the
    reference's useHist flags, trainingwrite.cpp:438-448); partial masks
    drop exactly the hidden history planes and keep legality consistent
    with the still-visible last move."""
    from katacoffee_tpu.nn.features import mask_history_state
    from katacoffee_tpu.program.engine import Engine
    from katacoffee_tpu.search import SearchParams
    from katacoffee_tpu.search.mcts import uniform_eval_fn

    cfg = CFG
    state = init_state(cfg)
    moves = [(2, 2, 0), (2, 1, 1), (4, 1, 2), (3, 0, 0), (3, 2, 3), (1, 4, 0)]
    for x, y, d in moves:
        state = play(cfg, state, x, y, d)
    assert not bool(state.done)

    # keep=0: equals engine.set_position of the same stones (no history)
    masked0 = mask_history_state(state, jnp.asarray(0, jnp.int32))
    eng = Engine(cfg, SearchParams.for_tests_v2(), uniform_eval_fn(cfg), seed=0)
    eng.set_position(np.asarray(state.board), to_move=int(state.to_move))
    f_masked = np.asarray(feat_fn(cfg)(masked0)[0])
    f_setpos = np.asarray(feat_fn(cfg)(eng.state)[0])
    np.testing.assert_array_equal(f_masked, f_setpos)

    # keep=1: equals set_position with the last move supplied
    masked1 = mask_history_state(state, jnp.asarray(1, jnp.int32))
    x, y, d = moves[-1]
    eng.set_position(
        np.asarray(state.board), to_move=int(state.to_move), last_move=(x, y, d)
    )
    np.testing.assert_array_equal(
        np.asarray(feat_fn(cfg)(masked1)[0]), np.asarray(feat_fn(cfg)(eng.state)[0])
    )

    # keep=k hides exactly the history planes beyond k; stones/legality/lines
    # unchanged for k >= 1
    full = np.asarray(feat_fn(cfg)(state)[0])
    for k in range(1, 5):
        fk = np.asarray(
            feat_fn(cfg)(mask_history_state(state, jnp.asarray(k, jnp.int32)))[0]
        )
        np.testing.assert_array_equal(fk[:3], full[:3])
        np.testing.assert_array_equal(fk[3:7], full[3:7])  # last move visible
        np.testing.assert_array_equal(fk[11:], full[11:])
        for j in range(4):  # ch 7+j = move j+2 ago, visible iff j+2 <= k
            if j + 2 <= k:
                np.testing.assert_array_equal(fk[7 + j], full[7 + j])
            else:
                assert fk[7 + j].sum() == 0


def test_sample_history_levels_distribution():
    from katacoffee_tpu.nn.features import sample_history_levels

    levels = np.asarray(
        sample_history_levels(jax.random.PRNGKey(0), 20000, keep_prob=0.9)
    )
    assert levels.min() >= 0 and levels.max() <= 5
    # P(level >= k) = 0.9^k
    for k in range(1, 5):
        frac = (levels >= k).mean()
        assert abs(frac - 0.9**k) < 0.02, (k, frac)
