"""Side-position forking tests (sidePositionProb, play.cpp:615-634,
1328-1345, 1578-1665; trainingwrite.cpp:120-158 side rows)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat, step
from katacoffee_tpu.search import SearchParams
from katacoffee_tpu.search.mcts import uniform_eval_fn
from katacoffee_tpu.selfplay import (
    SelfplaySettings,
    finalize_targets,
    init_side_state,
    run_selfplay_segment,
    run_side_segment,
)

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0)


def make_settings(**kw):
    base = dict(
        num_sims=20,
        init_games_with_policy=False,
        policy_surprise_weight=0.0,
        value_surprise_weight=0.0,
        side_position_prob=1.0,
        side_position_capacity=32,
    )
    base.update(kw)
    return SelfplaySettings(**base)


def run_segment(settings, B=4, T=6, seed=0):
    ev = uniform_eval_fn(CFG)
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    f = jax.jit(
        lambda s, e, r: run_selfplay_segment(CFG, SP, settings, ev, s, e, r, T)
    )
    return f(states, ep, jax.random.PRNGKey(seed))


class TestForkSampling:
    def test_fork_moves_are_legal_and_not_played(self):
        settings = make_settings()
        _, _, traj = run_segment(settings)
        fv = np.asarray(traj.fork_valid)
        assert fv.any(), "prob-1.0 forking produced no forks"
        played = np.asarray(traj.played_action)
        st_boards = np.asarray(traj.states.board)
        fk_boards = np.asarray(traj.fork_states.board)
        T, B = fv.shape
        for t in range(T):
            for b in range(B):
                if not fv[t, b]:
                    continue
                # the fork board has exactly one more stone than the row board
                assert (fk_boards[t, b] != 0).sum() == (st_boards[t, b] != 0).sum() + 1
                # the fork ACTION differs from the played one (the ban is on
                # the exact spot+direction Loc; the board alone can coincide
                # when only the direction differs)
                a = played[t, b]
                fork_a = (
                    int(np.asarray(traj.fork_states.last_dir)[t, b]) * CFG.area
                    + int(np.asarray(traj.fork_states.last_spot)[t, b])
                )
                assert fork_a != a

    def test_no_forks_when_disabled(self):
        settings = make_settings(side_position_prob=0.0)
        _, _, traj = run_segment(settings)
        assert not np.asarray(traj.fork_valid).any()


class TestSideSegment:
    def test_side_rows_have_search_targets_and_no_aux(self):
        settings = make_settings()
        _, _, traj = run_segment(settings)
        side0 = init_side_state(CFG, settings.side_position_capacity)
        ev = uniform_eval_fn(CFG)
        f = jax.jit(
            lambda ss, t, r: run_side_segment(CFG, SP, settings, ev, ss, t, r)
        )
        side1, batch = f(side0, traj, jax.random.PRNGKey(1))

        w = np.asarray(batch.weight)
        n_forks = int(np.asarray(traj.fork_valid).sum())
        assert w.sum() == min(n_forks, settings.side_position_capacity)
        live = w > 0
        # aux targets are masked off for side rows
        assert (np.asarray(batch.aux_weight) == 0).all()
        assert (np.asarray(batch.opponent_policy_weight) == 0).all()
        # policy target: a 20-visit search distribution over legal moves
        pt = np.asarray(batch.policy_target)[live]
        np.testing.assert_allclose(pt.sum(-1), 1.0, atol=1e-5)
        legal = np.asarray(
            jax.vmap(functools.partial(legal_mask_flat, CFG))(batch.states)
        )[live]
        assert (pt[~legal.astype(bool)] == 0).all() if legal.size else True
        # value target: normalized soft probs
        vt = np.asarray(batch.value_target)[live]
        np.testing.assert_allclose(vt.sum(-1), 1.0, atol=1e-5)
        # TD targets equal the value target (single-entry value list,
        # trainingwrite.cpp:127-146 fillValueTDTargets on a 1-elem buffer)
        td = np.asarray(batch.td_value_targets)[live]
        for i in range(td.shape[1]):
            np.testing.assert_allclose(td[:, i], vt, atol=1e-6)
        # continuations: a subset of previously-valid lanes, live states
        v1 = np.asarray(side1.valid)
        assert v1.sum() <= w.sum()
        if v1.any():
            assert not np.asarray(side1.states.done)[v1].any()

    def test_continuations_carry_across_segments(self):
        settings = make_settings()
        ev = uniform_eval_fn(CFG)
        side = init_side_state(CFG, settings.side_position_capacity)
        f = jax.jit(
            lambda ss, t, r: run_side_segment(CFG, SP, settings, ev, ss, t, r)
        )
        total = 0
        _, _, traj = run_segment(settings)
        for i in range(3):
            side, batch = f(side, traj, jax.random.PRNGKey(i))
            total += int(np.asarray(batch.weight).sum())
        assert total > 0


class TestMainRowsAux:
    def test_main_rows_aux_weight_one(self):
        settings = make_settings(side_position_prob=0.0)
        _, _, traj = run_segment(settings, T=30)
        batch = finalize_targets(CFG, settings, traj)
        assert (np.asarray(batch.aux_weight) == 1.0).all()
