"""Rules parity: vectorized JAX env vs the scalar oracle, plus hand-pinned
cases for each legality clause, win detection, and the frozen draw rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game import (
    GameConfig,
    init_state,
    legal_mask,
    legal_mask_flat,
    per_cell_max_run,
    run_lengths,
    situation_hash,
    step,
)
from katacoffee_tpu.game import jitted
from tests.oracle import OracleGame

CFG = GameConfig(5, 5, 4)


def np_mask(state, cfg=CFG):
    return np.asarray(jitted.legal_mask_fn(cfg)(state))


def oracle_mask(g):
    m = np.zeros((4, g.y_size, g.x_size), dtype=bool)
    for x, y, d in g.legal_moves():
        m[d, y, x] = True
    return m


def flat_action(cfg, x, y, d):
    return jnp.asarray(d * cfg.area + y * cfg.x_size + x, dtype=jnp.int32)


class TestInitialPosition:
    def test_initial_legal_mask_matches_oracle(self):
        state = init_state(CFG)
        g = OracleGame()
        np.testing.assert_array_equal(np_mask(state), oracle_mask(g))

    def test_corner_short_diagonals_are_illegal(self):
        # The NE-diagonal "line" through (0,0) is the single cell itself, so a
        # first move there with dir=NE leaves the opponent no cell: illegal.
        state = init_state(CFG)
        m = np_mask(state)
        assert not m[3, 0, 0]  # NE at top-left
        assert not m[2, 0, 4]  # NW at top-right
        assert not m[2, 4, 0]  # NW at bottom-left
        assert not m[3, 4, 4]  # NE at bottom-right
        # but N and W there are fine
        assert m[0, 0, 0] and m[1, 0, 0]

    def test_center_all_dirs_legal(self):
        m = np_mask(init_state(CFG))
        assert m[:, 2, 2].all()


class TestDirectionConstraint:
    def test_north_constrains_to_column(self):
        state = jitted.step_fn(CFG)(init_state(CFG), flat_action(CFG, 2, 2, 0))  # C-col, N
        m = np_mask(state)
        # all legal spots must be in column x=2, excluding (2,2)
        legal_spots = m.any(axis=0)
        ys, xs = np.nonzero(legal_spots)
        assert (xs == 2).all()
        assert not legal_spots[2, 2]
        assert legal_spots[0, 2] and legal_spots[4, 2]

    def test_west_constrains_to_row(self):
        state = jitted.step_fn(CFG)(init_state(CFG), flat_action(CFG, 2, 2, 1))
        legal_spots = np_mask(state).any(axis=0)
        ys, xs = np.nonzero(legal_spots)
        assert (ys == 2).all()

    def test_diagonals(self):
        state = jitted.step_fn(CFG)(init_state(CFG), flat_action(CFG, 2, 2, 2))  # NW
        legal_spots = np_mask(state).any(axis=0)
        ys, xs = np.nonzero(legal_spots)
        assert ((xs - 2) == (ys - 2)).all()
        state = jitted.step_fn(CFG)(init_state(CFG), flat_action(CFG, 2, 2, 3))  # NE
        legal_spots = np_mask(state).any(axis=0)
        ys, xs = np.nonzero(legal_spots)
        assert ((xs - 2) == -(ys - 2)).all()


class TestWinDetection:
    def test_four_in_a_row_wins(self):
        # The direction constraint makes hand-scripting a win awkward, so find
        # a decisive random game with the oracle and replay it through the env.
        cfg = CFG
        import random

        rnd = random.Random(7)
        found = None
        for attempt in range(2000):
            g = OracleGame()
            while not g.done:
                lm = g.legal_moves()
                g.play(*rnd.choice(lm))
            if g.winner != 0:
                found = g.history
                winner = g.winner
                break
        assert found is not None, "random play should produce wins"
        state = init_state(cfg)
        jstep = jitted.step_fn(cfg)
        for x, y, d, pla in found:
            state = jstep(state, flat_action(cfg, x, y, d))
        assert bool(state.done)
        assert int(state.winner) == winner

    def test_win_len_runs(self):
        cfg = CFG
        board = jnp.zeros((5, 5), jnp.int8)
        for x in range(4):
            board = board.at[1, x].set(1)
        runs = np.asarray(run_lengths(cfg, board))
        assert runs[1, 1, 0] == 4  # W-direction run of length 4 through (0..3,1)
        assert runs[0, 1, 0] == 1
        pcm = np.asarray(per_cell_max_run(cfg, board))
        assert pcm[1, 0] == 4 and pcm[1, 3] == 4
        assert pcm[1, 4] == 5  # empty run: row 4 empties? (1,4) empty, its row
        # has exactly one empty cell at x=4 -> empty runs: col x=4 all empty ->
        # N-run length 5


class TestRandomPlayoutParity:
    def test_trajectory_parity(self):
        import random

        cfg = CFG
        jstep = jitted.step_fn(cfg)
        jmask = jitted.legal_mask_fn(cfg)
        for seed in range(20):
            rnd = random.Random(seed)
            g = OracleGame()
            state = init_state(cfg)
            while not g.done:
                m_oracle = oracle_mask(g)
                m_jax = np.asarray(jmask(state))
                np.testing.assert_array_equal(m_jax, m_oracle)
                lm = g.legal_moves()
                x, y, d = rnd.choice(lm)
                g.play(x, y, d)
                state = jstep(state, flat_action(cfg, x, y, d))
                assert int(state.num_turns) == g.num_turns
            assert bool(state.done) == g.done
            assert int(state.winner) == g.winner
            np.testing.assert_array_equal(
                np.asarray(state.board), np.asarray(g.board, dtype=np.int8)
            )

    def test_parity_other_sizes(self):
        import random

        for x_size, y_size, win_len, seed in [(4, 4, 3, 0), (6, 6, 4, 1), (7, 5, 4, 2)]:
            cfg = GameConfig(x_size, y_size, win_len)
            rnd = random.Random(seed)
            g = OracleGame(x_size, y_size, win_len)
            state = init_state(cfg)
            jstep = jitted.step_fn(cfg)
            jmask = jitted.legal_mask_fn(cfg)
            while not g.done:
                np.testing.assert_array_equal(np.asarray(jmask(state)), oracle_mask(g))
                x, y, d = rnd.choice(g.legal_moves())
                g.play(x, y, d)
                state = jstep(state, flat_action(cfg, x, y, d))
            assert int(state.winner) == g.winner
            assert bool(state.done)


class TestDrawRule:
    def test_draw_reachable(self):
        """Random games on a tiny 3x3 win_len=3 board should sometimes end in
        the frozen draw rule (no legal move), and env must agree."""
        import random

        cfg = GameConfig(3, 3, 3)
        draws = 0
        for seed in range(40):
            rnd = random.Random(seed)
            g = OracleGame(3, 3, 3)
            state = init_state(cfg)
            jstep = jitted.step_fn(cfg)
            while not g.done:
                x, y, d = rnd.choice(g.legal_moves())
                g.play(x, y, d)
                state = jstep(state, flat_action(cfg, x, y, d))
            assert bool(state.done) == g.done
            assert int(state.winner) == g.winner
            if g.winner == 0:
                draws += 1
        assert draws > 0, "expected at least one stuck/draw game on 3x3"

    def test_step_after_done_is_noop(self):
        cfg = GameConfig(3, 3, 3)
        state = init_state(cfg)
        # reach a done state via random play
        import random

        rnd = random.Random(0)
        g = OracleGame(3, 3, 3)
        jstep = jitted.step_fn(cfg)
        while not g.done:
            x, y, d = rnd.choice(g.legal_moves())
            g.play(x, y, d)
            state = jstep(state, flat_action(cfg, x, y, d))
        before = jax.tree_util.tree_map(np.asarray, state)
        after = jitted.step_fn(cfg)(state, flat_action(cfg, 0, 0, 0))
        after = jax.tree_util.tree_map(np.asarray, after)
        for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)


class TestHashing:
    def test_transposition_same_hash(self):
        """Two move orders reaching the same (stones, lastLoc, to_move) hash
        equal; different lastLoc hashes differ."""
        cfg = CFG
        s0 = init_state(cfg)
        # Path A: B(2,2,N), W(2,0,W), B(4,0,N)
        a = jitted.step_fn(cfg)(s0, flat_action(cfg, 2, 2, 0))
        a = jitted.step_fn(cfg)(a, flat_action(cfg, 2, 0, 1))
        a = jitted.step_fn(cfg)(a, flat_action(cfg, 4, 0, 0))
        # Path B: same stones, same last move, different order of first two?
        # B must play first... B(2,2,N) then W must play col 2: W(2,0,*).
        # Alternate: B(2,2,N), W(2,0,W), B(4,0,N) is the only quick path; test
        # instead that same position with different last dir differs.
        b = jitted.step_fn(cfg)(s0, flat_action(cfg, 2, 2, 0))
        b = jitted.step_fn(cfg)(b, flat_action(cfg, 2, 0, 1))
        b = jitted.step_fn(cfg)(b, flat_action(cfg, 4, 0, 1))  # same spot, dir W
        ha = np.asarray(jitted.situation_hash_fn(cfg)(a))
        hb = np.asarray(jitted.situation_hash_fn(cfg)(b))
        assert (ha != hb).any()
        # and replaying path A again gives identical hash
        c = jitted.step_fn(cfg)(s0, flat_action(cfg, 2, 2, 0))
        c = jitted.step_fn(cfg)(c, flat_action(cfg, 2, 0, 1))
        c = jitted.step_fn(cfg)(c, flat_action(cfg, 4, 0, 0))
        np.testing.assert_array_equal(ha, np.asarray(jitted.situation_hash_fn(cfg)(c)))

    def test_stone_hash_order_independent(self):
        cfg = CFG
        s0 = init_state(cfg)
        a = jitted.step_fn(cfg)(s0, flat_action(cfg, 2, 2, 0))
        a = jitted.step_fn(cfg)(a, flat_action(cfg, 2, 0, 1))
        b = jitted.step_fn(cfg)(s0, flat_action(cfg, 2, 2, 0))
        b = jitted.step_fn(cfg)(b, flat_action(cfg, 2, 0, 1))
        np.testing.assert_array_equal(
            np.asarray(a.stone_hash), np.asarray(b.stone_hash)
        )


class TestVmap:
    def test_batched_playout(self):
        """256 games stepped in lockstep under vmap+jit, uniform random legal
        moves, must each match a scalar oracle replay."""
        cfg = CFG
        B = 64
        batch_init = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        vstep = jitted.vstep_fn(cfg)
        vmask = jitted.vlegal_mask_flat_fn(cfg)

        key = jax.random.PRNGKey(0)
        states = batch_init
        actions_log = []
        for t in range(40):
            masks = vmask(states)
            key, sub = jax.random.split(key)
            logits = jnp.where(masks, 0.0, -jnp.inf)
            acts = jax.random.categorical(sub, logits, axis=-1)
            # done games have all-false masks -> categorical over -inf is
            # undefined; replace with 0 (step is a no-op when done anyway)
            acts = jnp.where(states.done, 0, acts)
            actions_log.append(np.asarray(acts))
            states = vstep(states, acts)
            if bool(states.done.all()):
                break
        assert bool(states.done.all()), "5x5 games should finish within 40 plies"

        # replay three games through the oracle
        for gi in [0, 7, 63]:
            g = OracleGame()
            for t in range(len(actions_log)):
                if g.done:
                    break
                a = int(actions_log[t][gi])
                d, rest = divmod(a, cfg.area)
                y, x = divmod(rest, cfg.x_size)
                g.play(x, y, d)
            assert g.done
            assert g.winner == int(states.winner[gi])
            np.testing.assert_array_equal(
                np.asarray(states.board[gi]), np.asarray(g.board, dtype=np.int8)
            )
