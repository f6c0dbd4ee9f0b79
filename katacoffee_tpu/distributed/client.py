"""Contribute client: volunteer selfplay against a training server.

The role of the reference's `Client::Connection` + `MainCmds::contribute`
(`cpp/distributed/client.h:71-130`, `cpp/command/contribute.cpp:1051-1080`):
poll the server for a task, download the model if not cached, generate
selfplay data locally (the batched lockstep actor), upload npz shards and
SGFs, repeat — with retry/backoff on network errors (core/throttle.h role).
"""

from __future__ import annotations

import io
import json
import os
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.dataio.checkpoints import is_complete_model_dir, load_exported_model
from katacoffee_tpu.dataio.sgf import write_sgf
from katacoffee_tpu.dataio.trainingwrite import batch_to_arrays
from katacoffee_tpu.game.board import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, make_nn_eval_fn, uniform_eval_fn
from katacoffee_tpu.selfplay import SelfplaySettings, finalize_targets, run_selfplay_segment
from katacoffee_tpu.utils import Logger


class ContributeClient:
    def __init__(self, server_url: str, cache_dir: str, logger: Logger | None = None,
                 seed: int = 0, max_retries: int = 5, cafile: str | None = None):
        self.url = server_url.rstrip("/")
        self.cache_dir = cache_dir
        self.logger = logger or Logger(log_to_stdout=True)
        self.rng = jax.random.PRNGKey(seed)
        self.max_retries = max_retries
        # HTTPS: system CA bundle by default (the reference ships mozilla's,
        # contribute.cpp); `cafile` pins a self-hosted server's certificate
        self._ssl_ctx = None
        if self.url.startswith("https"):
            import ssl

            self._ssl_ctx = ssl.create_default_context(cafile=cafile)
        os.makedirs(cache_dir, exist_ok=True)

    # -- HTTP with retry/backoff (contribute.cpp:1063 throttling role) --

    def _request(self, path: str, data: bytes | None = None) -> bytes:
        last = None
        for attempt in range(self.max_retries):
            try:
                req = urllib.request.Request(self.url + path, data=data)
                with urllib.request.urlopen(req, timeout=60, context=self._ssl_ctx) as r:
                    return r.read()
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                last = e
                wait = min(2.0**attempt, 30.0)
                self.logger.write(f"contribute: {path} failed ({e}); retry in {wait:.0f}s")
                time.sleep(wait)
        raise RuntimeError(f"contribute: giving up on {path}: {last}")

    def get_task(self) -> dict:
        return json.loads(self._request("/api/task").decode())

    def ensure_model(self, name: str) -> str | None:
        """Download the model into the cache unless present. None = random."""
        if name == "random":
            return None
        model_dir = os.path.join(self.cache_dir, name)
        if is_complete_model_dir(model_dir):
            return model_dir
        os.makedirs(model_dir, exist_ok=True)
        for fname in ("model.json", "model.npz"):
            data = self._request(f"/api/model/{name}/{fname}")
            tmp = os.path.join(model_dir, "." + fname + ".tmp")
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, os.path.join(model_dir, fname))
        self.logger.write(f"contribute: downloaded model {name}")
        return model_dir

    # -- one work cycle ---------------------------------------------------

    def run_cycle(self, moves_per_segment: int = 64, batch_size: int | None = None) -> int:
        """Poll a task, do the work, upload. Selfplay tasks return rows
        uploaded; rating tasks (contribute.cpp:128,188) return games played."""
        task = self.get_task()
        cfg = GameConfig(task["xSize"], task["ySize"], task["winLen"])
        conf = task.get("config", {})
        if task.get("taskType") == "rating":
            return self._run_rating_task(task, cfg, conf, batch_size)
        name = task["modelName"]
        B = batch_size or int(conf.get("numParallelGames", 64))
        visits = int(conf.get("maxVisits", 600))

        model_dir = self.ensure_model(name)
        if model_dir is None:
            eval_fn = uniform_eval_fn(cfg)
        else:
            model, params, mcfg, meta = load_exported_model(model_dir)
            # same eval randomization as the local selfplay daemon
            eval_fn = make_nn_eval_fn(cfg, model, params, symmetry_randomize=True)

        sp = SearchParams.for_selfplay()
        settings = SelfplaySettings(num_sims=visits)
        states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
        ep = jnp.zeros((B,), jnp.int32)
        self.rng, k = jax.random.split(self.rng)
        _, _, traj = jax.jit(
            lambda s, e, r: run_selfplay_segment(cfg, sp, settings, eval_fn, s, e, r, moves_per_segment)
        )(states, ep, k)
        batch = finalize_targets(cfg, settings, traj)

        arrays = batch_to_arrays(batch, cfg)
        rows = int(arrays["weight"].shape[0])
        if rows > 0:
            buf = io.BytesIO()
            np.savez_compressed(buf, **arrays)
            self._request(f"/api/games/{name}", data=buf.getvalue())
        # SGFs of finished episodes
        from katacoffee_tpu.command.selfplay import extract_episodes

        for moves, winner in extract_episodes(cfg, traj):
            text = write_sgf(cfg.x_size, cfg.y_size, cfg.win_len, moves, name, name, winner=winner)
            self._request(f"/api/sgfs/{name}", data=(text + "\n").encode())
        self.logger.write(f"contribute: uploaded {rows} rows for model {name}")
        return rows

    def _run_rating_task(self, task: dict, cfg: GameConfig, conf: dict,
                         batch_size: int | None) -> int:
        """Play a server-assigned model-vs-model rating match and upload the
        SGFs (PB/PW = model names) for the server-side Elo summarizer —
        the reference's rating-game path (contribute.cpp:188,974).

        Deviation (batched idiom): instead of one game at server-assigned
        colors, the client plays a small batched match with colors alternated
        across games; each uploaded SGF's PB/PW reflects the actual colors,
        so the Elo fit sees exactly what was played."""
        import dataclasses as dc

        from katacoffee_tpu.program.match import match_sgfs, run_match

        name_b, name_w = task["modelBlack"], task["modelWhite"]
        games = batch_size or int(conf.get("numRatingGames", 8))
        visits = int(conf.get("maxVisits", 150))

        evals = {}
        for name in (name_b, name_w):
            model_dir = self.ensure_model(name)
            if model_dir is None:
                evals[name] = uniform_eval_fn(cfg)
            else:
                model, params, _mcfg, _meta = load_exported_model(model_dir)
                evals[name] = make_nn_eval_fn(cfg, model, params)

        # pure strength comparison: no root noise, slight opening variety —
        # the same profile the gatekeeper uses
        sp = dc.replace(
            SearchParams.for_selfplay(),
            rootNoiseEnabled=False,
            rootDesiredPerChildVisitsCoeff=0.0,
            chosenMoveTemperature=0.0,
            chosenMoveTemperatureEarly=0.3,
        )
        self.rng, k = jax.random.split(self.rng)
        seed = int(jax.random.randint(k, (), 0, 2**31 - 1))
        result = run_match(
            cfg, sp, sp, evals[name_b], evals[name_w],
            num_games=games, num_visits=visits, seed=seed, record_moves=True,
        )
        for text in match_sgfs(cfg, result, name_b, name_w):
            self._request("/api/ratinggames", data=(text + "\n").encode())
        self.logger.write(
            f"contribute: rating {name_b} vs {name_w}: "
            f"{result.wins_a}-{result.wins_b}-{result.draws} ({result.games} games)"
        )
        return result.games

    def run(self, max_cycles: int | None = None):
        n = 0
        while max_cycles is None or n < max_cycles:
            self.run_cycle()
            n += 1


def main(argv, **kw):
    import argparse

    ap = argparse.ArgumentParser(prog="katacoffee contribute")
    ap.add_argument("-server", required=True, help="training server URL")
    ap.add_argument("-cache-dir", default=os.path.expanduser("~/.cache/katacoffee_tpu/models"))
    ap.add_argument("-max-cycles", type=int, default=None)
    ap.add_argument("-seed", type=int, default=0)
    ap.add_argument("-cafile", default=None, help="CA bundle pinning a self-hosted HTTPS server")
    args = ap.parse_args(argv)
    ContributeClient(
        args.server, args.cache_dir, seed=args.seed, cafile=args.cafile
    ).run(args.max_cycles)


def main_serve(argv, **kw):
    import argparse

    from katacoffee_tpu.distributed.server import ContributionServer

    ap = argparse.ArgumentParser(prog="katacoffee serve")
    ap.add_argument("-base-dir", required=True)
    ap.add_argument("-host", default="0.0.0.0")
    ap.add_argument("-port", type=int, default=8088)
    ap.add_argument("-rating-game-prob", type=float, default=0.0,
                    help="fraction of tasks that are model-vs-model rating matches")
    ap.add_argument("-rating-visits", type=int, default=150)
    ap.add_argument("-rating-games", type=int, default=8)
    ap.add_argument("-certfile", default=None, help="serve HTTPS with this certificate")
    ap.add_argument("-keyfile", default=None)
    ap.add_argument("-selfplay-visits", type=int, default=600)
    ap.add_argument("-parallel-games", type=int, default=64)
    args = ap.parse_args(argv)
    cfg = GameConfig(5, 5, 4)
    server = ContributionServer(
        args.base_dir, cfg, host=args.host, port=args.port,
        selfplay_config={"maxVisits": args.selfplay_visits,
                         "numParallelGames": args.parallel_games},
        rating_game_prob=args.rating_game_prob,
        rating_config={"maxVisits": args.rating_visits, "numRatingGames": args.rating_games},
        certfile=args.certfile, keyfile=args.keyfile,
    )
    print(f"serving contribution bus for {args.base_dir} at {server.url}")
    server.serve_forever()
