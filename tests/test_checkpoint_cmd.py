"""Checkpoint-surgery command tests (clean_checkpoint.py / edit_checkpoint.py
roles, reference python/{clean,edit}_checkpoint.py): dump, in-place meta
edit, and release export of a trainer checkpoint."""

import json

import jax
import numpy as np

from katacoffee_tpu.command.checkpoint import main as ckpt_main
from katacoffee_tpu.dataio.checkpoints import load_exported_model, save_checkpoint
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet
from katacoffee_tpu.train import TrainConfig, init_train_state

CFG = GameConfig(5, 5, 4)


def _make_ckpt(tmp_path):
    model = CoffeeNet(get_model_spec("b1c6"), win_len=CFG.win_len)
    state = init_train_state(
        model, CFG, TrainConfig(), batch_size=8, rng=jax.random.PRNGKey(3)
    )
    path = str(tmp_path / "checkpoint.ckpt")
    save_checkpoint(path, state, extra={"train_step": 77})
    return path, state


def test_dump(tmp_path, capsys):
    path, state = _make_ckpt(tmp_path)
    assert ckpt_main(["dump", "-checkpoint", path, "-shapes"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["meta"]["train_step"] == 77
    n_params = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(state.params))
    assert out["params"]["num_elements"] == n_params
    assert any("num_elements" in out.get(k, {}) for k in ("opt_state", "ema_params"))
    assert len(out["params"]["leaves"]) > 0


def test_edit_meta_in_place(tmp_path):
    path, _ = _make_ckpt(tmp_path)
    assert ckpt_main(["edit", "-checkpoint", path, "-set", "train_step=5",
                      "-set", "note=rewound"]) == 0
    from katacoffee_tpu.command.checkpoint import _read_raw

    meta, blob = _read_raw(path)
    assert meta["train_step"] == 5 and meta["note"] == "rewound"
    # blob untouched: params still load
    model = CoffeeNet(get_model_spec("b1c6"), win_len=CFG.win_len)
    template = init_train_state(
        model, CFG, TrainConfig(), batch_size=8, rng=jax.random.PRNGKey(0)
    )
    from flax import serialization

    state = serialization.from_bytes(template, blob)
    assert int(state.step) >= 0


def test_export_release(tmp_path):
    path, state = _make_ckpt(tmp_path)
    out_dir = str(tmp_path / "models")
    assert ckpt_main([
        "export", "-checkpoint", path, "-model", "b1c6", "-out-dir", out_dir,
    ]) == 0
    model, params, cfg, meta = load_exported_model(str(tmp_path / "models" / "export-s77"))
    assert cfg == CFG and meta["train_step"] == 77
    # exported weights are the EMA params from the checkpoint
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(state.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
