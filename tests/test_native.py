"""Native C++ core tests: three-way parity between the JAX env, the Python
oracle, and the C++ core — the strongest form of the tier-1 'bit-exact rules'
requirement (two independent oracles agreeing with the vectorized env)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat, per_cell_max_run, step
from katacoffee_tpu.native import NativeGame, native_available, random_playouts
from tests.oracle import OracleGame

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")

CFG = GameConfig(5, 5, 4)


class TestNativeVsPythonOracle:
    def test_random_games_match(self):
        for seed in range(10):
            rnd = random.Random(seed)
            ng = NativeGame()
            og = OracleGame()
            while not og.done:
                legal = og.legal_moves()
                assert legal, "oracle stuck without done"
                # full legal-mask agreement every ply
                nm = ng.legal_mask()
                om = np.zeros_like(nm)
                for (x, y, d) in legal:
                    om[d * 25 + y * 5 + x] = True
                np.testing.assert_array_equal(nm, om)
                x, y, d = rnd.choice(legal)
                assert ng.play(x, y, d)
                og.play(x, y, d)
            assert ng.done == og.done
            assert ng.winner == og.winner
            np.testing.assert_array_equal(ng.board(), np.array(og.board, np.int8))
            np.testing.assert_array_equal(
                ng.per_cell_max_run(), og.per_cell_max_run()
            )

    def test_illegal_rejected(self):
        ng = NativeGame()
        assert ng.play(2, 2, 0)
        assert not ng.play(2, 2, 0)  # occupied
        assert not ng.play(0, 0, 0)  # off the constraint line
        assert ng.to_move == 2  # unchanged by illegal attempts


class TestNativeVsJaxEnv:
    def test_trajectory_parity(self):
        stepj = jax.jit(lambda s, a: step(CFG, s, a))
        legalj = jax.jit(lambda s: legal_mask_flat(CFG, s))
        for seed in range(6):
            rnd = random.Random(100 + seed)
            ng = NativeGame()
            s = init_state(CFG)
            while not ng.done:
                nm = ng.legal_mask()
                jm = np.asarray(legalj(s))
                np.testing.assert_array_equal(nm, jm)
                choices = np.where(nm)[0]
                a = int(rnd.choice(list(choices)))
                assert ng.play_action(a)
                s = stepj(s, jnp.asarray(a))
            assert bool(s.done) == ng.done
            assert int(s.winner) == ng.winner
            np.testing.assert_array_equal(np.asarray(s.board), ng.board())
            np.testing.assert_array_equal(
                np.asarray(per_cell_max_run(CFG, s.board)), ng.per_cell_max_run()
            )

    def test_replay_api(self):
        rnd = random.Random(7)
        og = OracleGame()
        actions = []
        while not og.done:
            x, y, d = rnd.choice(og.legal_moves())
            og.play(x, y, d)
            actions.append(d * 25 + y * 5 + x)
        ng = NativeGame()
        assert ng.replay(actions) == len(actions)
        assert ng.winner == og.winner
        # an illegal continuation stops the replay at the right index
        ng2 = NativeGame()
        assert ng2.replay(actions + [actions[0]]) == len(actions)


class TestRandomPlayouts:
    def test_deterministic_and_plausible(self):
        r1 = random_playouts(5, 5, 4, seed=42, n_games=200)
        r2 = random_playouts(5, 5, 4, seed=42, n_games=200)
        np.testing.assert_array_equal(r1, r2)
        winners, turns = r1[:, 0], r1[:, 1]
        # random 5×5 win-4 baselines (verify skill): mean length ~21,
        # draws ~40%, all games end by ply 25
        assert turns.max() <= 25
        assert 17 <= turns.mean() <= 24
        draw_frac = (winners == 0).mean()
        assert 0.2 <= draw_frac <= 0.6
        assert set(np.unique(winners)) <= {0, 1, 2}

    def test_matches_python_oracle_distribution(self):
        r = random_playouts(5, 5, 4, seed=1, n_games=300)
        assert abs(r[:, 1].mean() - 21.0) < 2.5
