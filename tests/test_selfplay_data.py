"""Tests for selfplay data tricks: policy-initialized openings
(playutils.cpp:147-174) and surprise-based row re-weighting
(play.cpp:1501-1570)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, uniform_eval_fn
from katacoffee_tpu.selfplay import SelfplaySettings, finalize_targets, run_selfplay_segment

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0)


def run_segment(settings, n_moves=30, B=8, seed=0):
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    ev = uniform_eval_fn(CFG)
    return jax.jit(
        lambda s, e, r: run_selfplay_segment(CFG, SP, settings, ev, s, e, r, n_moves)
    )(states, ep, jax.random.PRNGKey(seed))


class TestPolicyInit:
    def test_init_rows_weight_zero(self):
        settings = SelfplaySettings(
            num_sims=8,
            init_games_with_policy=True,
            policy_init_area_prop=0.3,  # exaggerated so inits surely occur
            policy_surprise_weight=0.0,
            value_surprise_weight=0.0,
        )
        _, _, traj = run_segment(settings, seed=2)
        batch = finalize_targets(CFG, settings, traj)
        pi = np.asarray(traj.policy_init).reshape(-1)
        w = np.asarray(batch.weight)
        assert pi.any(), "no policy-init rows sampled"
        assert (w[pi] == 0).all()

    def test_disabled_means_no_init_rows(self):
        settings = SelfplaySettings(num_sims=8, init_games_with_policy=False)
        _, _, traj = run_segment(settings, seed=3)
        assert not np.asarray(traj.policy_init).any()

    def test_init_moves_are_legal(self):
        """Replay through the oracle: policy-init moves must be legal too."""
        from tests.oracle import OracleGame

        settings = SelfplaySettings(num_sims=8, policy_init_area_prop=0.3)
        _, _, traj = run_segment(settings, seed=4)
        played = np.asarray(traj.played_action)
        done = np.asarray(traj.done_after)
        T, B = played.shape
        for b in range(min(B, 4)):
            g = OracleGame()
            for t in range(T):
                a = int(played[t, b])
                d, spot = a // 25, a % 25
                assert g.is_legal(spot % 5, spot // 5, d)
                g.play(spot % 5, spot // 5, d)
                if done[t, b]:
                    break


class TestSurpriseWeights:
    def _batches(self, psw, vsw, seed=5):
        settings = SelfplaySettings(
            num_sims=8,
            init_games_with_policy=False,
            policy_surprise_weight=psw,
            value_surprise_weight=vsw,
        )
        _, _, traj = run_segment(settings, n_moves=40, seed=seed)
        return traj, finalize_targets(CFG, settings, traj)

    def test_episode_weight_conserved(self):
        """The reweighting redistributes within an episode; each finished
        episode's total weight must be preserved."""
        traj, b_on = self._batches(0.5, 0.1)
        settings_off = SelfplaySettings(
            num_sims=8, init_games_with_policy=False,
            policy_surprise_weight=0.0, value_surprise_weight=0.0,
        )
        b_off = finalize_targets(CFG, settings_off, traj)
        T, B = traj.played_action.shape
        ep = np.asarray(traj.episode_id)
        w_on = np.asarray(b_on.weight).reshape(T, B)
        w_off = np.asarray(b_off.weight).reshape(T, B)
        for b in range(B):
            for e in np.unique(ep[:, b]):
                m = ep[:, b] == e
                if w_off[m, b].sum() >= 1:
                    np.testing.assert_allclose(
                        w_on[m, b].sum(), w_off[m, b].sum(), rtol=1e-4
                    )

    def test_weights_nonnegative_and_vary(self):
        traj, batch = self._batches(0.5, 0.1)
        w = np.asarray(batch.weight)
        assert (w >= -1e-6).all()
        live = w[w > 0]
        assert live.std() > 1e-3  # actually redistributes
