"""Distributed-selfplay bus tests: a real localhost server + client cycle —
the analogue of the reference's contribute path (cpp/distributed/client.cpp,
cpp/command/contribute.cpp), which the reference itself only covers with
-help goldens (SURVEY.md §4). We do better: a full task->model->selfplay->
upload round trip, with the uploaded shards read back through the standard
dataio path."""

import json
import os
import urllib.request

import jax
import pytest

from katacoffee_tpu.dataio.checkpoints import export_model
from katacoffee_tpu.dataio.trainingwrite import iter_shards, read_npz_rows
from katacoffee_tpu.distributed import ContributeClient, ContributionServer
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.utils import Logger

CFG = GameConfig(5, 5, 4)


@pytest.fixture()
def server(tmp_path):
    base = str(tmp_path / "server")
    os.makedirs(os.path.join(base, "models"), exist_ok=True)
    srv = ContributionServer(
        base, CFG, selfplay_config={"maxVisits": 6, "numParallelGames": 4}
    ).start()
    yield srv, base
    srv.stop()


class TestBus:
    def test_task_endpoint_random_sentinel(self, server):
        srv, base = server
        with urllib.request.urlopen(srv.url + "/api/task") as r:
            task = json.loads(r.read())
        assert task["modelName"] == "random"
        assert task["xSize"] == 5 and task["winLen"] == 4

    def test_model_download_and_404(self, server, tmp_path):
        srv, base = server
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet, init_params

        model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
        params = init_params(model, CFG, jax.random.PRNGKey(0))
        export_model(os.path.join(base, "models"), "net-0", params, "b1c6", CFG)

        with urllib.request.urlopen(srv.url + "/api/model/net-0/model.json") as r:
            meta = json.loads(r.read())
        assert meta["model"] == "b1c6"
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(srv.url + "/api/model/nope/model.json")
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(srv.url + "/api/model/../evil/model.json")

    def test_full_contribute_cycle(self, server, tmp_path):
        srv, base = server
        client = ContributeClient(srv.url, str(tmp_path / "cache"), logger=Logger(), seed=0)
        rows = client.run_cycle(moves_per_segment=26, batch_size=4)
        assert rows > 0
        tdata = os.path.join(base, "selfplay", "random", "tdata")
        shards = list(iter_shards(tdata))
        assert shards
        data = read_npz_rows(shards[0])
        assert data["weight"].shape[0] == rows or sum(
            read_npz_rows(s)["weight"].shape[0] for s in shards
        ) == rows
        sgfs = os.listdir(os.path.join(base, "selfplay", "random", "sgfs"))
        assert sgfs

    def test_https_round_trip(self, tmp_path):
        """TLS bus: self-signed server cert + client pinning via cafile —
        the reference's HTTPS-only volunteer protocol (distributed/client.cpp
        + mozilla CA bundle)."""
        import subprocess

        cert = str(tmp_path / "server.pem")
        key = str(tmp_path / "server.key")
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", key, "-out", cert, "-days", "1",
             "-subj", "/CN=127.0.0.1",
             "-addext", "subjectAltName=IP:127.0.0.1"],
            check=True, capture_output=True,
        )
        base = str(tmp_path / "server_dir")
        os.makedirs(os.path.join(base, "models"), exist_ok=True)
        srv = ContributionServer(base, CFG, certfile=cert, keyfile=key).start()
        try:
            assert srv.url.startswith("https://")
            client = ContributeClient(
                srv.url, str(tmp_path / "cache"), logger=Logger(), seed=0, cafile=cert
            )
            task = client.get_task()
            assert task["modelName"] == "random"
        finally:
            srv.stop()

    def test_rating_games_round_trip(self, tmp_path):
        """Server assigns a rating task, client plays the batched match and
        uploads SGFs, the Elo summarizer consumes them — the reference's
        volunteer rating-game loop (contribute.cpp:128,188,974)."""
        from katacoffee_tpu.command.summarize_sgfs import collect_results
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet, init_params
        from katacoffee_tpu.utils import compute_elos

        base = str(tmp_path / "server")
        models = os.path.join(base, "models")
        os.makedirs(models, exist_ok=True)
        for i in range(2):
            model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
            params = init_params(model, CFG, jax.random.PRNGKey(i))
            export_model(models, f"net-{i}", params, "b1c6", CFG)
        srv = ContributionServer(
            base, CFG, rating_game_prob=1.0,
            rating_config={"maxVisits": 6, "numRatingGames": 2},
            rating_seed=0,
        ).start()
        try:
            with urllib.request.urlopen(srv.url + "/api/task") as r:
                task = json.loads(r.read())
            assert task["taskType"] == "rating"
            assert {task["modelBlack"], task["modelWhite"]} == {"net-0", "net-1"}

            client = ContributeClient(srv.url, str(tmp_path / "cache"), logger=Logger(), seed=0)
            games = client.run_cycle(batch_size=2)
            assert games == 2
            rating_dir = os.path.join(base, "ratinggames")
            sgfs = [f for f in os.listdir(rating_dir) if f.endswith(".sgf")]
            assert len(sgfs) == 2
            records = collect_results([rating_dir])
            assert sum(r[2] + r[3] + r[4] for r in records) == 2
            elos = compute_elos(records)
            assert set(elos.as_dict()) == {"net-0", "net-1"}
        finally:
            srv.stop()

    def test_contribute_uses_exported_model(self, server, tmp_path):
        srv, base = server
        from katacoffee_tpu.nn.configs import get_model_spec
        from katacoffee_tpu.nn.model import CoffeeNet, init_params

        model = CoffeeNet(get_model_spec("b1c6"), win_len=4)
        params = init_params(model, CFG, jax.random.PRNGKey(1))
        export_model(os.path.join(base, "models"), "net-1", params, "b1c6", CFG)

        client = ContributeClient(srv.url, str(tmp_path / "cache"), logger=Logger(), seed=1)
        rows = client.run_cycle(moves_per_segment=26, batch_size=4)
        assert rows > 0
        # data landed under the model's own dir and the model was cached
        assert os.path.isdir(os.path.join(base, "selfplay", "net-1", "tdata"))
        assert os.path.isfile(str(tmp_path / "cache" / "net-1" / "model.npz"))
