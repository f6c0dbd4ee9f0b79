"""Selfplay actor + training step tests: trajectory/target invariants,
overfit-on-fixed-batch, replay buffer, and the data-parallel sharded step."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.game.board import legal_mask_flat
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet, init_params
from katacoffee_tpu.search import SearchParams, uniform_eval_fn, make_nn_eval_fn
from katacoffee_tpu.selfplay import (
    SelfplaySettings,
    finalize_targets,
    run_selfplay_segment,
)
from katacoffee_tpu.train import (
    ReplayBuffer,
    TrainConfig,
    init_train_state,
    make_train_step,
)

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0, chosenMoveTemperature=0.5, chosenMoveTemperatureEarly=0.8)
SETTINGS = SelfplaySettings(num_sims=8)


@functools.lru_cache(maxsize=None)
def segment_fn(T, B):
    ev = uniform_eval_fn(CFG)

    def run(states, ep, rng):
        return run_selfplay_segment(CFG, SP, SETTINGS, ev, states, ep, rng, T)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def finalize_fn():
    return jax.jit(lambda traj: finalize_targets(CFG, SETTINGS, traj))


def make_traj(T=40, B=8, seed=0):
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    new_states, new_ep, traj = segment_fn(T, B)(states, ep, jax.random.PRNGKey(seed))
    return new_states, new_ep, traj


class TestActor:
    def test_moves_are_legal_and_episodes_advance(self):
        T, B = 40, 8
        _, new_ep, traj = make_traj(T, B)
        states = traj.states
        acts = np.asarray(traj.played_action)
        for t in range(0, T, 7):
            st_t = jax.tree_util.tree_map(lambda x: x[t], states)
            legal = np.asarray(jax.vmap(functools.partial(legal_mask_flat, CFG))(st_t))
            ok = legal[np.arange(B), acts[t]]
            assert ok.all(), t
        # with T=40 and max game length 25, every game finishes >= 1 episode
        assert (np.asarray(new_ep) >= 1).all()
        # done_after implies a winner recorded or draw
        done = np.asarray(traj.done_after)
        assert done.any()

    def test_targets_consistent(self):
        T, B = 40, 8
        _, _, traj = make_traj(T, B)
        batch = finalize_fn()(traj)
        w = np.asarray(batch.weight)
        assert w.sum() > 0
        z = np.asarray(batch.value_target)  # [R,3]
        # one-hot rows where weight>0
        assert np.allclose(z[w > 0].sum(-1), 1.0)

        done = np.asarray(traj.done_after).reshape(-1)
        winner = np.asarray(traj.winner_after).reshape(-1)
        mover = np.asarray(traj.states.to_move).reshape(-1)
        # rows where the game ended on this move: mover wins unless draw
        endrows = done & (w > 0)
        winrows = endrows & (winner != 0)
        assert (winner[winrows] == mover[winrows]).all()
        assert (z[winrows, 0] == 1).all()
        drawrows = endrows & (winner == 0)
        if drawrows.any():
            assert (z[drawrows, 2] == 1).all()

        # ownership target matches final board from mover perspective
        own = np.asarray(batch.ownership_target).reshape(len(w), -1)
        assert set(np.unique(own[w > 0])).issubset({-1.0, 0.0, 1.0})

        # td targets are probability vectors
        td = np.asarray(batch.td_value_targets)
        assert np.allclose(td[w > 0].sum(-1), 1.0, atol=1e-5)

        # varTimeLeft >= 1 on valid rows and == 1 on ending rows
        vtl = np.asarray(batch.var_time_left_target)
        assert (vtl[w > 0] >= 1).all()
        assert (vtl[endrows] == 1).all()

    def test_alternating_z_within_episode(self):
        T, B = 40, 4
        _, _, traj = make_traj(T, B, seed=1)
        batch = finalize_fn()(traj)
        w = np.asarray(batch.weight).reshape(T, B)
        z = (
            np.asarray(batch.value_target[:, 0] - batch.value_target[:, 1])
            .reshape(T, B)
        )
        done = np.asarray(traj.done_after)
        ep = np.asarray(traj.episode_id)
        for b in range(B):
            for t in range(T - 1):
                if w[t, b] > 0 and w[t + 1, b] > 0 and ep[t, b] == ep[t + 1, b]:
                    # decisive games alternate sign of z between movers
                    if abs(z[t, b]) == 1:
                        assert z[t, b] == -z[t + 1, b]


class TestTraining:
    def test_loss_decreases_on_fixed_batch(self):
        spec = get_model_spec("b1c6")
        model = CoffeeNet(spec, win_len=CFG.win_len)
        tc = TrainConfig(learning_rate=3e-3, warmup_steps=1, symmetry_augment=False)
        _, _, traj = make_traj(30, 8)
        batch = finalize_fn()(traj)
        state = init_train_state(model, CFG, tc, batch_size=240, rng=jax.random.PRNGKey(0))
        step = make_train_step(model, CFG, tc, batch_size=240)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0], losses

    def test_symmetry_augmentation_runs(self):
        spec = get_model_spec("b1c6")
        model = CoffeeNet(spec, win_len=CFG.win_len)
        tc = TrainConfig(warmup_steps=1, symmetry_augment=True)
        _, _, traj = make_traj(30, 8)
        batch = finalize_fn()(traj)
        state = init_train_state(model, CFG, tc, batch_size=240, rng=jax.random.PRNGKey(0))
        step = make_train_step(model, CFG, tc, batch_size=240)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    def test_replay_buffer(self):
        _, _, traj = make_traj(30, 8)
        batch = finalize_fn()(traj)
        buf = ReplayBuffer(capacity=1000)
        n = buf.add(batch)
        assert n > 0 and buf.size == n
        sample = buf.sample(32)
        assert sample.policy_target.shape == (32, CFG.policy_size)
        assert (sample.weight > 0).all()
        # ring wrap-around
        for _ in range(10):
            buf.add(batch)
        assert buf.size <= 1000
        buf.sample(64)


class TestShardedTraining:
    def test_data_parallel_mesh_step(self):
        from jax.sharding import Mesh
        from katacoffee_tpu.train import make_sharded_train_step

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("data",))
        spec = get_model_spec("b1c6")
        model = CoffeeNet(spec, win_len=CFG.win_len)
        tc = TrainConfig(warmup_steps=1, symmetry_augment=False)
        _, _, traj = make_traj(32, 8)
        batch = finalize_fn()(traj)
        # pad/trim to a multiple of 8
        R = (batch.weight.shape[0] // 8) * 8
        batch = jax.tree_util.tree_map(lambda x: x[:R], batch)
        state = init_train_state(model, CFG, tc, batch_size=R, rng=jax.random.PRNGKey(0))
        step, shard_batch, place_state = make_sharded_train_step(
            model, CFG, tc, batch_size=R, mesh=mesh
        )
        state = place_state(state)
        sbatch = shard_batch(batch)
        state, metrics = step(state, sbatch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        state, metrics2 = step(state, sbatch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics2["loss"]))


class TestLrSchedule:
    """Reference stepped LR policy (train.py:569-628, 'fixup' row): per-sample
    LR x stepped warmup keyed on samples seen, output heads at half LR."""

    def test_warmup_scale_steps(self):
        from katacoffee_tpu.train.train import warmup_scale_at

        assert warmup_scale_at(0) == 1.0 / 5.0
        assert warmup_scale_at(999_999) == 1.0 / 5.0
        assert warmup_scale_at(1_000_000) == 1.0 / 3.0
        assert warmup_scale_at(3_999_999) == 1.0 / 2.0
        assert warmup_scale_at(5_000_000) == 1.0 / 1.4
        assert warmup_scale_at(6_000_000) == 1.0
        # scaled thresholds
        assert warmup_scale_at(30_000, samples_scale=0.02) == 1.0 / 3.0
        assert warmup_scale_at(200_000, samples_scale=0.02) == 1.0

    def test_current_lr_matches_schedule(self):
        from katacoffee_tpu.train.train import current_lr

        tc = TrainConfig(learning_rate=0.02, warmup_samples_scale=1.0)
        # batch 256 = batch_scale; step 0 -> 1/5 of base LR
        assert abs(current_lr(tc, 256, 0) - 0.02 / 5) < 1e-12
        # past all thresholds -> full LR
        assert abs(current_lr(tc, 256, 100_000) - 0.02) < 1e-12

    def test_stepwise_schedule_in_jit_and_head_scale(self):
        """One optimizer step: output-head params move ~half as much as trunk
        params under equal gradients (group_scale 0.5, train.py:610-620), and
        the jitted stepped schedule matches the host-side view."""
        import optax
        from katacoffee_tpu.train.train import make_optimizer, current_lr

        tc = TrainConfig(
            learning_rate=0.02, warmup_samples_scale=1.0, momentum=0.0,
            weight_decay=0.0, grad_clip=1e9,
        )
        opt = make_optimizer(tc, batch_size=256)
        params = {
            "trunk": {"kernel": jnp.ones((3,))},
            "PolicyHead_0": {"kernel": jnp.ones((3,))},
        }
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        st = opt.init(params)
        updates, st = opt.update(grads, st, params)
        trunk_step = float(-updates["trunk"]["kernel"][0])
        head_step = float(-updates["PolicyHead_0"]["kernel"][0])
        assert abs(trunk_step - current_lr(tc, 256, 0)) < 1e-9
        assert abs(head_step - 0.5 * trunk_step) < 1e-9
        # threshold crossing: samples = step*256 pass 1M between steps
        # 3906 and 3907, stepping the lr from 1/5 to 1/3 of base
        assert abs(current_lr(tc, 256, 3906) - 0.02 / 5) < 1e-12
        assert abs(current_lr(tc, 256, 3907) - 0.02 / 3) < 1e-12
