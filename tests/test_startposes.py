"""Start-position tests: SGF loading (PositionSample role) and selfplay
episodes actually beginning from pool positions."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.dataio.sgf import write_sgf
from katacoffee_tpu.game.board import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, uniform_eval_fn
from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment
from katacoffee_tpu.selfplay.startposes import load_startposes
from tests.oracle import OracleGame

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0)


def make_sgf_dir(tmp_path, n_games=3, seed=0):
    d = tmp_path / "sgfs"
    d.mkdir()
    rnd = random.Random(seed)
    for i in range(n_games):
        g = OracleGame()
        mv = []
        while not g.done:
            x, y, dd = rnd.choice(g.legal_moves())
            mv.append((x, y, dd, g.to_move))
            g.play(x, y, dd)
        (d / f"g{i}.sgf").write_text(
            write_sgf(5, 5, 4, mv, "a", "b", winner=g.winner) + "\n"
        )
    return str(d)


class TestLoadStartposes:
    def test_loads_prefix_positions(self, tmp_path):
        d = make_sgf_dir(tmp_path)
        out = load_startposes(CFG, d)
        assert out is not None
        pool, probs = out
        K = probs.shape[0]
        assert K > 10
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
        turns = np.asarray(pool.num_turns)
        assert (turns >= 1).all()
        assert not np.asarray(pool.done).any()

    def test_turn_weight_lambda(self, tmp_path):
        d = make_sgf_dir(tmp_path)
        _, p0 = load_startposes(CFG, d, turn_weight_lambda=0.0)
        pool, p1 = load_startposes(CFG, d, turn_weight_lambda=0.3)
        turns = np.asarray(pool.num_turns).astype(np.float64)
        # positive lambda prefers earlier positions
        assert (p1 * turns).sum() < (p0 * turns).sum()

    def test_placements_sgf(self, tmp_path):
        text = write_sgf(5, 5, 4, [], "a", "b", placements=[(0, 0, 1), (4, 4, 2)])
        f = tmp_path / "pos.sgf"
        f.write_text(text + "\n")
        pool, probs = load_startposes(CFG, [str(f)])
        assert probs.shape[0] == 1
        board = np.asarray(pool.board[0])
        assert board[0, 0] == 1 and board[4, 4] == 2

    def test_wrong_size_skipped(self, tmp_path):
        text = write_sgf(7, 7, 4, [(0, 0, 0, 1)], "a", "b")
        f = tmp_path / "bad.sgf"
        f.write_text(text + "\n")
        assert load_startposes(CFG, [str(f)]) is None


class TestStartposSelfplay:
    def test_episodes_start_from_pool(self, tmp_path):
        d = make_sgf_dir(tmp_path, seed=3)
        pool, probs = load_startposes(CFG, d)
        settings = SelfplaySettings(
            num_sims=4, startposes_prob=1.0, init_games_with_policy=False,
            policy_surprise_weight=0.0, value_surprise_weight=0.0,
        )
        B = 8
        states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        ev = uniform_eval_fn(CFG)
        _, _, traj = jax.jit(
            lambda s, e, r: run_selfplay_segment(
                CFG, SP, settings, ev, s, e, r, 30,
                startpos_pool=(pool, jnp.asarray(probs)),
            )
        )(states, ep, jax.random.PRNGKey(0))
        # after the first episode ends, the next one must begin mid-game
        ep_ids = np.asarray(traj.episode_id)
        turns = np.asarray(traj.states.num_turns)
        started_later = [
            turns[t, b]
            for t in range(1, turns.shape[0])
            for b in range(B)
            if ep_ids[t, b] != ep_ids[t - 1, b]
        ]
        assert started_later, "no episode resets inside the segment"
        assert max(started_later) > 0, "resets never used a start position"
