"""Tests for the data I/O layer: SGF round-trips (reference tier-1
testsgf.cpp analogue, Coffee 3-letter moves per sgf.cpp:83-153), npz training
writer/reader round-trips, shuffler window policy, checkpoint/export/polling.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.dataio import (
    TrainingDataWriter,
    compute_window_size,
    export_model,
    find_latest_model,
    load_checkpoint,
    parse_sgf,
    read_npz_rows,
    save_checkpoint,
    shuffle_data,
    write_sgf,
)
from katacoffee_tpu.dataio.checkpoints import load_exported_model
from katacoffee_tpu.dataio.trainingwrite import iter_shards, rows_to_batch
from katacoffee_tpu.game.board import GameConfig, init_state

CFG = GameConfig(5, 5, 4)


def play_random_game(seed=0, max_moves=30):
    """Random legal game via the test oracle (host, scalar)."""
    from tests.oracle import OracleGame
    import random

    rnd = random.Random(seed)
    g = OracleGame()
    moves = []
    while not g.done and len(moves) < max_moves:
        legal = g.legal_moves()
        if not legal:
            break
        x, y, d = rnd.choice(legal)
        pla = g.to_move
        g.play(x, y, d)
        moves.append((x, y, d, pla))
    return g, moves


class TestSgf:
    def test_move_roundtrip(self):
        from katacoffee_tpu.dataio.sgf import move_to_sgf, sgf_to_move

        for x in range(5):
            for y in range(5):
                for d in range(4):
                    s = move_to_sgf(x, y, d)
                    assert len(s) == 3
                    assert sgf_to_move(s) == (x, y, d)

    def test_game_roundtrip(self):
        g, moves = play_random_game(seed=1)
        winner = g.winner if g.done else None
        text = write_sgf(5, 5, 4, moves, "botA", "botB", winner=winner)
        sgf = parse_sgf(text)
        assert sgf.board_size() == (5, 5)
        assert sgf.win_len() == 4
        assert sgf.moves() == moves
        if winner == 1:
            assert sgf.result() == "B+"
        elif winner == 2:
            assert sgf.result() == "W+"

    def test_header_format(self):
        text = write_sgf(5, 5, 4, [], "b", "w", winner=1)
        assert text.startswith("(;FF[4]GM[Coffee]SZ[5]WLL[4]")
        assert "RE[B+]" in text
        rect = write_sgf(5, 7, 4, [], "b", "w")
        assert "SZ[5:7]" in rect

    def test_resignation_and_draw(self):
        assert "RE[W+R]" in write_sgf(5, 5, 4, [], "b", "w", winner=2, is_resignation=True)
        assert "RE[0]" in write_sgf(5, 5, 4, [], "b", "w", winner=0)

    def test_placements(self):
        text = write_sgf(5, 5, 4, [], "b", "w", placements=[(0, 0, 1), (4, 4, 2)])
        sgf = parse_sgf(text)
        assert sgf.placements() == [(0, 0, 1), (4, 4, 2)]

    def test_escaping_and_comments(self):
        text = write_sgf(5, 5, 4, [(0, 0, 0, 1)], "a]b\\c", "w", comments={0: "x]y"})
        sgf = parse_sgf(text)
        assert sgf.root.get("PB") == "a]b\\c"

    def test_branches_take_main_line(self):
        text = "(;FF[4]GM[Coffee]SZ[5]WLL[4](;B[aaa];W[bbb])(;B[ccc]))"
        sgf = parse_sgf(text)
        assert sgf.moves() == [(0, 0, 0, 1), (1, 1, 1, 2)]


def make_tiny_batch(n_moves=26, B=4):
    from katacoffee_tpu.search import SearchParams, uniform_eval_fn
    from katacoffee_tpu.selfplay import (
        SelfplaySettings,
        finalize_targets,
        run_selfplay_segment,
    )

    sp = SearchParams(valueWeightExponent=0.0)
    settings = SelfplaySettings(num_sims=4)
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    ev = uniform_eval_fn(CFG)
    _, _, traj = jax.jit(
        lambda s, e, r: run_selfplay_segment(CFG, sp, settings, ev, s, e, r, n_moves)
    )(states, ep, jax.random.PRNGKey(0))
    return finalize_targets(CFG, settings, traj)


class TestTrainingWrite:
    def test_write_read_roundtrip(self, tmp_path):
        batch = make_tiny_batch(n_moves=26, B=4)
        w = TrainingDataWriter(str(tmp_path), CFG, max_rows_per_file=16)
        n = w.add_batch(batch)
        w.flush()
        assert n > 0
        assert n == int((np.asarray(batch.weight) > 0).sum())
        shards = list(iter_shards(str(tmp_path)))
        assert shards
        total = 0
        for s in shards:
            data = read_npz_rows(s)
            total += data["weight"].shape[0]
            assert (data["weight"] > 0).all()  # zero-weight rows dropped
            assert data["board"].dtype == np.int8
        assert total == n

    def test_rows_to_batch_features_match(self, tmp_path):
        """Serialized rows must reproduce identical NN features."""
        import functools

        from katacoffee_tpu.nn.features import extract_features

        batch = make_tiny_batch(n_moves=26, B=3)
        w = TrainingDataWriter(str(tmp_path), CFG, max_rows_per_file=10_000)
        w.add_batch(batch)
        w.flush()
        (shard,) = list(iter_shards(str(tmp_path)))
        loaded = rows_to_batch(read_npz_rows(shard), CFG)

        keep = np.asarray(batch.weight) > 0
        feats = jax.vmap(functools.partial(extract_features, CFG))
        orig_sp, _ = feats(batch.states)
        got_sp, _ = feats(loaded.states)
        np.testing.assert_allclose(np.asarray(orig_sp)[keep], np.asarray(got_sp))
        np.testing.assert_allclose(
            np.asarray(batch.policy_target)[keep],
            np.asarray(loaded.policy_target),
            atol=1e-3,  # f16 storage
        )

    def test_sharding(self, tmp_path):
        batch = make_tiny_batch(n_moves=26, B=4)
        n_rows = int((np.asarray(batch.weight) > 0).sum())
        w = TrainingDataWriter(str(tmp_path), CFG, max_rows_per_file=7)
        w.add_batch(batch)
        w.flush()
        sizes = [read_npz_rows(s)["weight"].shape[0] for s in iter_shards(str(tmp_path))]
        assert sum(sizes) == n_rows
        assert all(sz <= 7 for sz in sizes)


class TestShuffle:
    def test_window_power_law(self):
        # below min_rows: whole run
        assert compute_window_size(1000, min_rows=5000) == 1000
        # at exactly min_rows: min_rows
        assert compute_window_size(5000, min_rows=5000) == 5000
        # growth is sublinear with exponent < 1
        w1 = compute_window_size(1_000_000, min_rows=250_000)
        w2 = compute_window_size(2_000_000, min_rows=250_000)
        assert 250_000 < w1 < 1_000_000
        assert w1 < w2 < 2 * w1
        # exponent 1 + expand 1 = keep everything
        assert (
            compute_window_size(
                10**6, min_rows=1000, expand_window_per_row=1.0, taper_window_exponent=1.0
            )
            == 10**6
        )

    def test_shuffle_outputs(self, tmp_path):
        data_dir = tmp_path / "tdata"
        out_dir = tmp_path / "shuffled"
        batch = make_tiny_batch(n_moves=26, B=4)
        w = TrainingDataWriter(str(data_dir), CFG, max_rows_per_file=9)
        w.add_batch(batch)
        w.flush()
        stats = shuffle_data(
            [str(data_dir)], str(out_dir), min_rows=10**9, chunk_rows=8, seed=0
        )
        assert stats["rows_out"] == stats["total_rows"] > 0
        total = sum(
            read_npz_rows(s)["weight"].shape[0] for s in iter_shards(str(out_dir))
        )
        assert total == stats["rows_out"]

    def test_keep_target(self, tmp_path):
        data_dir = tmp_path / "tdata"
        batch = make_tiny_batch(n_moves=26, B=4)
        w = TrainingDataWriter(str(data_dir), CFG, max_rows_per_file=1000)
        w.add_batch(batch)
        w.flush()
        stats = shuffle_data(
            [str(data_dir)], str(tmp_path / "out"), min_rows=10**9, keep_target_rows=5, seed=0
        )
        assert stats["rows_out"] == 5


class TestCheckpoints:
    def test_checkpoint_roundtrip(self, tmp_path):
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet
        from katacoffee_tpu.train import TrainConfig, init_train_state

        model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
        tc = TrainConfig(warmup_steps=1)
        state = init_train_state(model, CFG, tc, batch_size=8, rng=jax.random.PRNGKey(0))
        path = str(tmp_path / "checkpoint.ckpt")
        save_checkpoint(path, state, extra={"train_step": 0})
        save_checkpoint(path, state, extra={"train_step": 1})  # rotation
        assert os.path.exists(path + ".prev")
        loaded, meta = load_checkpoint(path, state)
        assert meta["train_step"] == 1
        for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_export_load_find_latest(self, tmp_path):
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet, init_params

        models_dir = str(tmp_path / "models")
        os.makedirs(models_dir)
        assert find_latest_model(models_dir) is None  # "random" sentinel

        model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
        params = init_params(model, CFG, jax.random.PRNGKey(1))
        d1 = export_model(models_dir, "net-0", params, "b1c6", CFG)
        time.sleep(0.01)
        d2 = export_model(
            models_dir, "net-1", params, "b1c6", CFG, extra={"export_time": time.time() + 10}
        )
        assert find_latest_model(models_dir) == d2

        model2, params2, cfg2, meta = load_exported_model(d1)
        assert cfg2 == CFG
        assert meta["model"] == "b1c6"
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_incomplete_dir_ignored(self, tmp_path):
        models_dir = str(tmp_path / "models")
        os.makedirs(os.path.join(models_dir, "broken"))
        assert find_latest_model(models_dir) is None
