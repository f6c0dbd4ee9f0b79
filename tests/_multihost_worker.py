"""Worker for tests/test_multihost.py: one of two cooperating processes.

Run: python tests/_multihost_worker.py RANK PORT OUT_JSON

Exercises the real multi-host code paths — `init_distributed`, local vs
global meshes, `shard_leading_axis`'s cross-host placement, `local_rows`,
and the multi-process branch of `make_sharded_train_step` — on a
2-process x 2-device virtual CPU cluster, the CI analogue of a 2-host TPU
pod slice (tools/launch_2host.sh). The reference's equivalent surface is
torch DDP + NCCL init in train.py:403 and the per-machine selfplay workers
(SURVEY.md §2.8 P2/P5).
"""

import json
import os
import sys

# 2 virtual CPU devices per process -> 4 global. Must be set before backend
# init; the sandbox sitecustomize only *imports* jax, so this is in time.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")


def make_synth_batch(cfg, n_rows, seed):
    """A synthetic TrainingBatch of fresh initial states with normalized
    random targets — enough for the train step to produce finite losses."""
    import numpy as np

    from katacoffee_tpu.game.board import init_state
    from katacoffee_tpu.selfplay.actor import TrainingBatch

    rng = np.random.default_rng(seed)
    s0 = init_state(cfg)
    states = jax.tree_util.tree_map(
        lambda a: np.broadcast_to(np.asarray(a), (n_rows,) + np.asarray(a).shape).copy(),
        s0,
    )
    A = cfg.policy_size
    Y, X = cfg.y_size, cfg.x_size

    def simplex(shape):
        p = rng.random(shape).astype(np.float32) + 1e-3
        return p / p.sum(-1, keepdims=True)

    value = simplex((n_rows, 3))
    return TrainingBatch(
        states=states,
        policy_target=simplex((n_rows, A)),
        opponent_policy_target=simplex((n_rows, A)),
        value_target=value,
        td_value_targets=np.repeat(value[:, None, :], 3, axis=1),
        ownership_target=np.zeros((n_rows, Y, X), np.float32),
        line_target=np.zeros((n_rows, Y, X), np.int32),
        futurepos_target=np.zeros((n_rows, 2, Y, X), np.float32),
        var_time_left_target=np.full((n_rows,), 10.0, np.float32),
        shortterm_value_target=np.zeros((n_rows,), np.float32),
        weight=np.ones((n_rows,), np.float32),
        opponent_policy_weight=np.ones((n_rows,), np.float32),
        aux_weight=np.ones((n_rows,), np.float32),
    )


def main():
    rank, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import numpy as np

    from katacoffee_tpu.parallel import (
        init_distributed,
        local_rows,
        make_data_mesh,
        shard_leading_axis,
    )

    pidx, pc = init_distributed(f"127.0.0.1:{port}", 2, rank)
    assert (pidx, pc) == (rank, 2), (pidx, pc)
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import jax.numpy as jnp

    res = {"rank": rank}

    # --- local mesh: fully addressable even though process_count > 1, so
    # shard_leading_axis must take the plain device_put path
    lm = make_data_mesh(local=True)
    assert lm.devices.size == 2
    x = np.arange(8, dtype=np.float32).reshape(8, 1) + 100.0 * rank
    lx = shard_leading_axis(lm, x)
    assert lx.sharding.is_fully_addressable
    res["local_sum"] = float(jnp.sum(lx))  # differs per host by design

    # --- global mesh: callback placement, per-host shard contents,
    # cross-host reduction, local_rows pullback
    gm = make_data_mesh()
    assert gm.devices.size == 4
    g = np.arange(32, dtype=np.float32).reshape(16, 2)
    gx = shard_leading_axis(gm, g)
    assert not gx.sharding.is_fully_addressable
    for sh in gx.addressable_shards:
        np.testing.assert_array_equal(np.asarray(sh.data), g[sh.index])
    tot = jax.jit(jnp.sum)(gx)
    res["global_sum"] = float(np.asarray(tot.addressable_shards[0].data))
    mine = local_rows(gx)  # this host's 8 of the 16 rows
    assert mine.shape == (8, 2), mine.shape
    res["my_row_ids"] = sorted(int(v) // 2 for v in mine[:, 0])

    # --- multi-host data-parallel train step: each host contributes its own
    # 4 rows of the global 8-row batch; loss/grads must come out identical
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet
    from katacoffee_tpu.train import (
        TrainConfig,
        init_train_state,
        make_sharded_train_step,
    )

    cfg = GameConfig(5, 5, 4)
    model = CoffeeNet(get_model_spec("b1c6"), win_len=cfg.win_len)
    tc = TrainConfig(warmup_steps=1, symmetry_augment=False)
    state = init_train_state(model, cfg, tc, batch_size=8, rng=jax.random.PRNGKey(0))
    step, shard_batch, place_state = make_sharded_train_step(
        model, cfg, tc, batch_size=8, mesh=gm
    )
    state = place_state(state)
    batch = make_synth_batch(cfg, 4, seed=1000 + rank)  # distinct rows/host
    sb = shard_batch(batch)
    for leaf in jax.tree_util.tree_leaves(sb):
        assert leaf.shape[0] == 8, leaf.shape  # local 4 -> global 8
    for i in range(2):
        state, metrics = step(state, sb, jax.random.PRNGKey(i))
    m = {k: float(v) for k, v in local_rows(metrics).items()}
    assert all(np.isfinite(v) for v in m.values()), m
    res["loss"] = m["loss"]
    res["grad_norm"] = m["grad_norm"]

    with open(out_path, "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
