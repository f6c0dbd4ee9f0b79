"""Checkpointing, model export, and model-dir polling.

Covers three reference mechanisms:
  * trainer checkpoint/resume (`python/train.py:253-289,375+`):
    `save_checkpoint`/`load_checkpoint` persist the full TrainState (params,
    optimizer state, EMA params, step) with rotation (checkpoint_prev);
  * model export for selfplay (`python/export_model_pytorch.py` writing
    `<name>/model.bin.gz` dirs): `export_model` writes `<models_dir>/<name>/`
    containing `model.npz` (EMA params) + `model.json` (spec/game config);
  * selfplay's latest-model polling (`cpp/dataio/loadmodel.cpp`
    LoadModel::findLatestModel, used at `cpp/command/selfplay.cpp:149-166`):
    `find_latest_model` returns the newest complete exported model dir, or
    None meaning "random" (uniform-prior evals, the reference's sentinel).

Weights serialize via flax.serialization msgpack inside an npz-style file;
directories are written tmp→rename so pollers never see partial exports.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import jax
import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# Trainer checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state, extra: dict | None = None):
    """Serialize a TrainState (or any pytree) + metadata. Rotates the previous
    checkpoint to `<path>.prev` (train.py:253-289 rotation)."""
    data = serialization.to_bytes(state)
    meta = dict(extra or {})
    meta["save_time"] = time.time()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(len(json.dumps(meta).encode()).to_bytes(8, "little"))
        f.write(json.dumps(meta).encode())
        f.write(data)
    if os.path.exists(path):
        os.replace(path, path + ".prev")
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template):
    """Returns (state, meta). `state_template` supplies the pytree structure
    (make it with init_train_state)."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        data = f.read()
    state = serialization.from_bytes(state_template, data)
    return state, meta


# ---------------------------------------------------------------------------
# Model export (the checkpoint bus between learner and actors)
# ---------------------------------------------------------------------------


def _flatten_params(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def export_model(
    models_dir: str,
    name: str,
    params,
    model_name: str,
    cfg,
    extra: dict | None = None,
) -> str:
    """Write `<models_dir>/<name>/{model.npz, model.json}` atomically.
    Returns the model dir path."""
    final = os.path.join(models_dir, name)
    tmp = os.path.join(models_dir, f".tmp_{name}_{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    np.savez(os.path.join(tmp, "model.npz"), **_flatten_params(params))
    meta = {
        "name": name,
        "model": model_name,
        # NNModelVersion role (modelversion.cpp:9-35): Coffee resets to
        # version 1, whose input spec is the V1 feature planes; loaders
        # reject models from a different inputs era
        "model_version": 1,
        "inputs_version": 1,
        "x_size": cfg.x_size,
        "y_size": cfg.y_size,
        "win_len": cfg.win_len,
        "export_time": time.time(),
    }
    meta.update(extra or {})
    with open(os.path.join(tmp, "model.json"), "w") as f:
        json.dump(meta, f, indent=2)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return final


def load_exported_model(model_dir: str):
    """Returns (params, meta). Rebuilds the params pytree from the flat npz by
    re-initializing the named model and mapping leaves by flattened path."""
    import jax.numpy as jnp

    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params

    with open(os.path.join(model_dir, "model.json")) as f:
        meta = json.load(f)
    iv = meta.get("inputs_version", 1)
    if iv != 1:
        raise ValueError(
            f"{model_dir}: inputs_version {iv} unsupported (this build "
            "implements V1 features; NNModelVersion role)"
        )
    cfg = GameConfig(meta["x_size"], meta["y_size"], meta["win_len"])
    model = CoffeeNet(get_model_spec(meta["model"]), win_len=cfg.win_len)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    flat = dict(np.load(os.path.join(model_dir, "model.npz")))

    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise ValueError(f"{model_dir}: missing weight {key}")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"{model_dir}: {key} shape {arr.shape} != {leaf.shape}")
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return model, params, cfg, meta


def is_complete_model_dir(d: str) -> bool:
    return os.path.isfile(os.path.join(d, "model.npz")) and os.path.isfile(
        os.path.join(d, "model.json")
    )


def find_latest_model(models_dir: str) -> str | None:
    """Newest complete model dir by export_time (fall back to mtime), or None
    = "random" sentinel (loadmodel.cpp semantics)."""
    if not os.path.isdir(models_dir):
        return None
    best, best_t = None, -1.0
    for name in os.listdir(models_dir):
        d = os.path.join(models_dir, name)
        if name.startswith(".") or not os.path.isdir(d) or not is_complete_model_dir(d):
            continue
        try:
            with open(os.path.join(d, "model.json")) as f:
                t = float(json.load(f).get("export_time", 0.0))
        except (json.JSONDecodeError, OSError):
            continue
        if t <= 0.0:
            t = os.path.getmtime(os.path.join(d, "model.npz"))
        if t > best_t:
            best, best_t = d, t
    return best
