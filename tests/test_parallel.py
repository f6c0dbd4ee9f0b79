"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): sharded selfplay + data-parallel
training through the real daemon entry points, and mesh utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game.board import GameConfig, init_state
from katacoffee_tpu.parallel import make_data_mesh, replicate, shard_leading_axis
from katacoffee_tpu.search import SearchParams
from katacoffee_tpu.utils import Logger

CFG = GameConfig(5, 5, 4)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


class TestMeshUtils:
    def test_make_mesh(self):
        mesh = make_data_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)
        half = make_data_mesh(4)
        assert half.devices.size == 4

    def test_shard_and_replicate(self):
        mesh = make_data_mesh()
        x = jnp.arange(16.0).reshape(16, 1)
        xs = shard_leading_axis(mesh, {"a": x})
        shardings = xs["a"].sharding
        assert shardings.is_fully_replicated is False
        r = replicate(mesh, {"w": jnp.ones((3, 3))})
        assert r["w"].sharding.is_fully_replicated


class TestShardedSelfplay:
    def test_daemon_with_mesh(self, tmp_path):
        from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon

        sp = SearchParams.for_selfplay()
        spc = SelfplayConfig(
            batch_size=8, num_sims=6, moves_per_segment=26, max_segments=1,
            seed=0, use_mesh=True, write_sgfs=False,
        )
        rows = run_selfplay_daemon(str(tmp_path), CFG, sp, spc, Logger())
        assert rows > 0

    def test_sharded_search_matches_single_device(self):
        """The SPMD search must produce the same trees as the same program
        on one device (pure data parallelism, no cross-game coupling)."""
        from katacoffee_tpu.search import run_search, uniform_eval_fn

        sp = SearchParams(valueWeightExponent=0.0, useGraphSearch=False)
        ev = uniform_eval_fn(CFG)
        B = 8
        states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
        f = jax.jit(lambda r, k: run_search(CFG, sp, ev, r, 20, k).edge_visits[:, 0])
        single = np.asarray(f(states, jax.random.PRNGKey(0)))
        mesh = make_data_mesh()
        sharded_states = shard_leading_axis(mesh, states)
        multi = np.asarray(f(sharded_states, jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(single, multi)


class TestDataParallelTraining:
    def test_run_training_uses_mesh(self, tmp_path):
        """Data-parallel trainer through run_training, with shuffled data
        prepared via the normal pipeline."""
        from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon
        from katacoffee_tpu.command.train import TrainerConfig, run_training
        from katacoffee_tpu.dataio.shuffle import shuffle_data
        from katacoffee_tpu.train import TrainConfig

        base = str(tmp_path)
        sp = SearchParams.for_selfplay()
        run_selfplay_daemon(
            base, CFG, sp,
            SelfplayConfig(batch_size=8, num_sims=6, moves_per_segment=30,
                           max_segments=1, seed=1, write_sgfs=False),
            Logger(),
        )
        shuffle_data(
            [os.path.join(base, "selfplay", "random", "tdata")],
            os.path.join(base, "shuffleddata"), min_rows=10**9, seed=0,
        )
        tc = TrainConfig(warmup_steps=1)
        trc = TrainerConfig(model="b1c6", batch_size=16, max_steps=2,
                            steps_per_export=10**9, seed=0, use_mesh=True)
        steps = run_training(base, CFG, tc, trc, Logger())
        assert steps == 2
