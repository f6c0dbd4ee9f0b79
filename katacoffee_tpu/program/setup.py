"""Config → engine objects: the role of the reference's `Setup`
(`cpp/program/setup.{h,cpp}`): map config keys onto SearchParams (same key
names as searchparams.h, so reference configs translate), game config, and
eval functions, with per-frontend defaults and unused-key warnings left to
the caller."""

from __future__ import annotations

import dataclasses

from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.search.params import SearchParams
from katacoffee_tpu.utils import ConfigParser


def load_game_config(cfg: ConfigParser) -> GameConfig:
    return GameConfig(
        cfg.get_int("xSize", 5, min=2, max=19),
        cfg.get_int("ySize", 5, min=2, max=19),
        cfg.get_int("winLen", 4, min=2),
    )


def load_search_params(cfg: ConfigParser, defaults: SearchParams | None = None) -> SearchParams:
    """Every SearchParams field is a config key (Setup::loadParams,
    setup.cpp:500-800: reads each known key if present, else default)."""
    base = defaults if defaults is not None else SearchParams()
    updates = {}
    for field in dataclasses.fields(SearchParams):
        if not cfg.contains(field.name):
            continue
        if field.type in ("bool", bool):
            updates[field.name] = cfg.get_bool(field.name)
        elif field.type in ("int", int):
            updates[field.name] = cfg.get_int(field.name)
        else:
            updates[field.name] = cfg.get_float(field.name)
    return dataclasses.replace(base, **updates)


def load_eval_fn(cfg: GameConfig, model_dir: str | None):
    """Model dir -> EvalFn; None -> uniform priors (the 'random' sentinel)."""
    from katacoffee_tpu.search import make_nn_eval_fn, uniform_eval_fn

    if model_dir is None:
        return uniform_eval_fn(cfg), cfg, "random"
    from katacoffee_tpu.dataio.checkpoints import load_exported_model

    model, params, mcfg, meta = load_exported_model(model_dir)
    return make_nn_eval_fn(cfg if mcfg is None else mcfg, model, params), mcfg, meta["name"]
