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


class TestHintposes:
    """hintPosesProb / rootHintLoc (play.cpp:424-446,885-901;
    searchhelpers.cpp:206-218; searchexplorehelpers.cpp:155-168)."""

    def test_with_hints_returns_next_moves(self, tmp_path):
        d = make_sgf_dir(tmp_path, n_games=1, seed=3)
        out = load_startposes(CFG, d, with_hints=True)
        assert out is not None
        pool, probs, hints = out
        assert hints.shape == probs.shape
        # re-derive: parse the sgf and check a few positions' hints
        from katacoffee_tpu.dataio.sgf import parse_sgf_file

        f = [os.path.join(d, n) for n in os.listdir(d)][0]
        moves = parse_sgf_file(f).moves()
        turns = np.asarray(pool.num_turns)
        for k in range(hints.shape[0]):
            t = int(turns[k])  # position after t moves; hint = move t (0-based)
            if t < len(moves):
                x, y, dd, _ = moves[t]
                assert int(hints[k]) == dd * CFG.area + y * CFG.x_size + x
            else:
                assert int(hints[k]) == -1

    def test_root_hint_forces_exploration(self):
        """With uniform priors and a hint on an arbitrary legal move, the
        forced-selection rule must give the hint move weight comparable to
        the most-searched move (the 0.8x rule)."""
        from katacoffee_tpu.search import run_search
        from katacoffee_tpu.search.mcts import root_visit_counts

        B = 4
        roots = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_state(CFG)
        )
        hint = jnp.full((B,), 42, jnp.int32)  # some legal move on empty board
        tree = jax.jit(
            lambda r, k: run_search(
                CFG, SP, uniform_eval_fn(CFG), r, 60, k, root_hint=hint
            )
        )(roots, jax.random.PRNGKey(0))
        v = np.asarray(root_visit_counts(tree))
        assert (v[:, 42] >= 0.4 * v.max(-1)).all(), v[:, 42]

        # without the hint, move 42 is nothing special under uniform priors
        tree0 = jax.jit(
            lambda r, k: run_search(CFG, SP, uniform_eval_fn(CFG), r, 60, k)
        )(roots, jax.random.PRNGKey(0))
        v0 = np.asarray(root_visit_counts(tree0))
        assert v[:, 42].mean() > v0[:, 42].mean()

    def test_hint_episodes_in_segment(self, tmp_path):
        d = make_sgf_dir(tmp_path, n_games=2, seed=5)
        pool, probs, hints = load_startposes(CFG, d, with_hints=True)
        settings = SelfplaySettings(
            num_sims=16,
            init_games_with_policy=False,
            hintposes_prob=1.0,
        )
        B = 4
        states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        f = jax.jit(
            lambda s, e, r: run_selfplay_segment(
                CFG, SP, settings, uniform_eval_fn(CFG), s, e, r, 30,
                hintpos_pool=(pool, jnp.asarray(probs), jnp.asarray(hints)),
            )
        )
        _, _, traj = f(states, ep, jax.random.PRNGKey(1))
        hf = np.asarray(traj.hint_first)
        done = np.asarray(traj.done_after)
        # every episode reset inside the segment starts from a hint position
        T = hf.shape[0]
        for t in range(T - 1):
            for b in range(hf.shape[1]):
                if done[t, b]:
                    assert hf[t + 1, b], f"reset at {t},{b} did not carry a hint"
        # and hint rows exist only at episode starts
        nonfirst = np.zeros_like(hf)
        nonfirst[1:][~done[:-1]] = True
        assert not (hf & nonfirst).any()
