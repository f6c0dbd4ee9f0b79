"""Loop fault injection: SIGKILL the selfplay daemon mid-run and the trainer
mid-epoch as REAL subprocesses, then assert the recovery contracts the
reference survives by design (SURVEY §5 failure detection;
`/root/reference/cpp/command/selfplay.cpp:203-228` data-writing loop,
`/root/reference/python/train.py:253-289` checkpoint rotation):

  * no partial shard is ever visible to consumers (tmp+rename atomicity;
    iter_shards skips in-flight temp files even when the kill lands mid
    write);
  * a fresh daemon resumes into the same directory tree and its output
    shuffles cleanly together with the pre-kill shards;
  * the trainer's rotating checkpoint (checkpoint / checkpoint.prev)
    survives a kill between saves and a resumed trainer continues from the
    persisted step, not from scratch.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(code: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        # own process group so the kill cannot touch the test runner
        preexec_fn=os.setsid,
    )


SELFPLAY_CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.search import SearchParams
from katacoffee_tpu.utils import Logger

cfg = GameConfig(5, 5, 4)
sp = SearchParams.for_selfplay()
spc = SelfplayConfig(batch_size=8, num_sims=8, moves_per_segment=8,
                     segments_per_flush=1, max_segments=1000, seed={seed})
run_selfplay_daemon({base!r}, cfg, sp, spc, Logger())
"""

TRAIN_CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from katacoffee_tpu.command.train import TrainerConfig, run_training
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.train import TrainConfig
from katacoffee_tpu.utils import Logger

cfg = GameConfig(5, 5, 4)
tc = TrainConfig(warmup_steps=2, symmetry_augment=False)
trc = TrainerConfig(model="b1c6", batch_size=16, max_steps={steps},
                    steps_per_export=10**9, checkpoint_every=5,
                    max_epochs_per_data=10**9, seed=0)
run_training({base!r}, cfg, tc, trc, Logger())
print("TRAIN_DONE")
"""


def _wait_for(cond, timeout=900, poll=0.5, desc=""):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(poll)
    raise TimeoutError(f"timed out waiting for {desc}")


def test_selfplay_daemon_sigkill_leaves_no_partial_shards(tmp_path):
    from katacoffee_tpu.dataio.shuffle import shuffle_data
    from katacoffee_tpu.dataio.trainingwrite import iter_shards

    base = str(tmp_path)
    tdata = os.path.join(base, "selfplay", "random", "tdata")

    proc = _spawn(SELFPLAY_CODE.format(repo=REPO, base=base, seed=1))
    try:
        # let it produce at least one finalized shard, then SIGKILL the
        # whole group mid-flight (no clean shutdown, no SIGINT flush)
        _wait_for(
            lambda: os.path.isdir(tdata) and any(True for _ in iter_shards(tdata)),
            desc="first shard",
        )
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(timeout=60)

    shards = list(iter_shards(tdata))
    assert shards, "daemon produced no shards before the kill"
    # every visible shard loads cleanly end-to-end — nothing partial
    total_rows = 0
    META_KEYS = {"schema_version", "board_shape"}  # per-file, not per-row
    for s in shards:
        with np.load(s) as z:
            n = None
            for k in z.files:
                if k in META_KEYS:
                    continue
                arr = z[k]
                n = arr.shape[0] if n is None else n
                assert arr.shape[0] == n, f"ragged shard {s}"
            total_rows += n
    assert total_rows > 0

    # a leftover in-flight temp file (simulating a kill mid-write) is
    # invisible to iter_shards and to the shuffler
    junk = os.path.join(tdata, ".junk.npz.tmp")
    with open(junk, "wb") as f:
        f.write(b"half a shard")
    assert junk not in list(iter_shards(tdata))

    # resume: a fresh daemon writes into the same tree; combined data
    # shuffles cleanly (the consumer contract)
    proc2 = _spawn(SELFPLAY_CODE.format(repo=REPO, base=base, seed=2))
    try:
        _wait_for(
            lambda: len(list(iter_shards(tdata))) > len(shards),
            desc="post-resume shard",
        )
    finally:
        try:
            os.killpg(proc2.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc2.wait(timeout=60)

    stats = shuffle_data(
        [tdata], os.path.join(base, "shuffleddata"), min_rows=10**9, seed=0
    )
    assert stats["rows_out"] >= total_rows


def test_trainer_sigkill_resumes_from_rotating_checkpoint(tmp_path):
    from katacoffee_tpu.dataio.checkpoints import load_checkpoint

    base = str(tmp_path)

    def load_meta(path):
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet
        from katacoffee_tpu.train import TrainConfig as _TC, init_train_state

        model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
        template = init_train_state(
            model, cfg, _TC(warmup_steps=2, symmetry_augment=False),
            batch_size=16, rng=jax.random.PRNGKey(0),
        )
        return load_checkpoint(path, template)

    # seed training data quickly in-process
    import jax

    from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon
    from katacoffee_tpu.dataio.shuffle import shuffle_data
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.search import SearchParams
    from katacoffee_tpu.utils import Logger

    cfg = GameConfig(5, 5, 4)
    spc = SelfplayConfig(
        batch_size=8, num_sims=8, moves_per_segment=30, max_segments=2, seed=0
    )
    run_selfplay_daemon(base, cfg, SearchParams.for_selfplay(), spc, Logger())
    shuffle_data(
        [os.path.join(base, "selfplay", "random", "tdata")],
        os.path.join(base, "shuffleddata"),
        min_rows=10**9,
        seed=0,
    )

    ckpt = os.path.join(base, "train", "run", "checkpoint.ckpt")

    proc = _spawn(TRAIN_CODE.format(repo=REPO, base=base, steps=10_000))
    try:
        _wait_for(lambda: os.path.exists(ckpt), desc="first checkpoint")
        # wait for a rotation so checkpoint.prev exists, then kill
        _wait_for(lambda: os.path.exists(ckpt + ".prev"), desc="rotation")
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(timeout=60)

    # both generations load; the newest records a positive step
    state, extra = load_meta(ckpt)
    step_at_kill = int(extra["train_step"])
    assert step_at_kill >= 5
    load_meta(ckpt + ".prev")

    # resume: a bounded run continues FROM the persisted step (5 more)
    out = subprocess.run(
        [sys.executable, "-c", TRAIN_CODE.format(repo=REPO, base=base, steps=5)],
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert "TRAIN_DONE" in out.stdout, out.stdout[-2000:]
    state2, extra2 = load_meta(ckpt)
    assert int(extra2["train_step"]) == step_at_kill + 5
