"""End-to-end pipeline test: one tiny synchronous-loop cycle —
selfplay → shuffle → train → export → gatekeeper promotion — through the
same public entry points the CLI uses, against a temp base dir with the
reference loop's on-disk layout (SURVEY.md §2.8 P6)."""

import os

import numpy as np
import pytest

from katacoffee_tpu.command.gatekeeper import GatekeeperConfig, run_gatekeeper
from katacoffee_tpu.command.loop import LoopConfig, run_loop
from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon
from katacoffee_tpu.command.train import TrainerConfig, run_training
from katacoffee_tpu.dataio import find_latest_model
from katacoffee_tpu.dataio.shuffle import shuffle_data
from katacoffee_tpu.dataio.trainingwrite import iter_shards
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.search import SearchParams
from katacoffee_tpu.train import TrainConfig
from katacoffee_tpu.utils import Logger

CFG = GameConfig(5, 5, 4)


@pytest.fixture()
def quiet_logger():
    return Logger()


def test_full_cycle(tmp_path, quiet_logger):
    base = str(tmp_path)
    sp = SearchParams.for_selfplay()

    # 1. selfplay from "random" (no model yet)
    spc = SelfplayConfig(
        batch_size=8, num_sims=8, moves_per_segment=30, max_segments=2, seed=0
    )
    rows = run_selfplay_daemon(base, CFG, sp, spc, quiet_logger)
    assert rows > 0
    tdata = os.path.join(base, "selfplay", "random", "tdata")
    assert list(iter_shards(tdata))
    sgfs = os.listdir(os.path.join(base, "selfplay", "random", "sgfs"))
    assert sgfs

    # 2. shuffle
    stats = shuffle_data([tdata], os.path.join(base, "shuffleddata"), min_rows=10**9, seed=0)
    assert stats["rows_out"] == rows

    # 3. train a few steps on a tiny net + export a candidate
    tc = TrainConfig(warmup_steps=2, symmetry_augment=True)
    trc = TrainerConfig(model="b1c6", batch_size=16, max_steps=4, steps_per_export=10**9, seed=0)
    steps = run_training(base, CFG, tc, trc, quiet_logger)
    assert steps == 4
    test_dir = os.path.join(base, "modelstobetested")
    candidates = os.listdir(test_dir)
    assert len(candidates) == 1

    # 4. gatekeeper: no champion -> unconditional promotion
    gc = GatekeeperConfig(num_games=4, num_visits=4, seed=0)
    n = run_gatekeeper(base, CFG, gc, quiet_logger, once=True)
    assert n == 1
    promoted = find_latest_model(os.path.join(base, "models"))
    assert promoted is not None

    # 5. second candidate must actually play the champion
    trc2 = TrainerConfig(model="b1c6", batch_size=16, max_steps=2, steps_per_export=10**9, seed=1)
    run_training(base, CFG, tc, trc2, quiet_logger, run_name="run2")
    n = run_gatekeeper(base, CFG, gc, quiet_logger, once=True)
    assert n == 1
    # either promoted or rejected; both dirs are valid outcomes
    promoted_now = set(os.listdir(os.path.join(base, "models")))
    rejected = set(os.listdir(os.path.join(base, "rejectedmodels"))) if os.path.isdir(
        os.path.join(base, "rejectedmodels")
    ) else set()
    assert len(promoted_now) + len(rejected) == 2

    # 6. selfplay now picks up the promoted model
    spc2 = SelfplayConfig(batch_size=4, num_sims=4, moves_per_segment=8, max_segments=1, seed=1)
    rows2 = run_selfplay_daemon(base, CFG, sp, spc2, quiet_logger)
    model_dirs = [
        d for d in os.listdir(os.path.join(base, "selfplay")) if d != "random"
    ]
    assert model_dirs  # per-model output dir created for the promoted net


def test_run_loop_smoke(tmp_path, quiet_logger):
    """run_loop drives the same cycle through LoopConfig."""
    lc = LoopConfig(
        num_cycles=1,
        rows_per_cycle=40,
        selfplay_batch=8,
        selfplay_visits=4,
        train_steps_per_cycle=2,
        train_batch=8,
        model="b1c6",
        gate_games=2,
        gate_visits=4,
        shuffle_min_rows=10**9,
        seed=0,
    )
    run_loop(str(tmp_path), CFG, lc, quiet_logger)
    assert find_latest_model(os.path.join(str(tmp_path), "models")) is not None
