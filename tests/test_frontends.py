"""Tests for the host engine + protocol frontends: GTP (tier-3 of the
reference's test strategy, cpp/runcmdtests.sh / tests/gtp/*.txt analogue),
the JSON analysis engine (docs/Analysis_Engine.md protocol), game IO strings,
and the batched match runner."""

import json

import numpy as np
import pytest

from katacoffee_tpu.game import io as gio
from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.program.engine import Engine, IllegalMoveError
from katacoffee_tpu.search import SearchParams
from katacoffee_tpu.search.timecontrols import TimeControls, visits_for_time

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0)


class TestGameIO:
    def test_spot_strings(self):
        assert gio.spot_to_string(0, 4, CFG) == "A1"  # bottom-left
        assert gio.spot_to_string(0, 0, CFG) == "A5"  # top-left
        assert gio.spot_to_string(4, 0, CFG) == "E5"
        assert gio.parse_spot("A1", CFG) == (0, 4)
        assert gio.parse_spot("e5", CFG) == (4, 0)

    def test_no_letter_i(self):
        cfg9 = GameConfig(9, 9, 4)
        assert gio.spot_to_string(8, 8, cfg9) == "J1"  # I skipped
        assert gio.parse_spot("J1", cfg9) == (8, 8)

    def test_loc_roundtrip(self):
        for a in range(CFG.policy_size):
            s = gio.action_to_string(a, CFG)
            assert gio.parse_action(s, CFG) == a
            c = gio.action_to_compact(a, CFG)
            assert " " not in c
            assert gio.parse_action(c, CFG) == a

    def test_direction_aliases(self):
        assert gio.parse_direction("n") == gio.parse_direction("north")
        assert gio.parse_direction("NW") == gio.parse_direction("northwest")

    def test_board_string_roundtrip(self):
        import numpy as np

        board = np.zeros((5, 5), np.int8)
        board[0, 0] = 1
        board[4, 4] = 2
        text = gio.board_to_string(board, CFG)
        parsed = gio.parse_board(text, CFG)
        np.testing.assert_array_equal(parsed, board)


class TestEngine:
    def test_play_and_legality(self):
        eng = Engine(CFG, SP)
        eng.play(2, 2, 0)  # C3 north
        assert eng.to_move == 2
        # direction constraint: next move must be in column 2 (north line)
        assert eng.is_legal(2, 0, 1)
        assert not eng.is_legal(0, 0, 0)
        with pytest.raises(IllegalMoveError):
            eng.play(0, 0, 0)
        with pytest.raises(IllegalMoveError):
            eng.play(2, 0, 1, pla=1)  # wrong player

    def test_undo(self):
        eng = Engine(CFG, SP)
        eng.play(2, 2, 0)
        eng.play(2, 0, 1)
        eng.undo()
        assert eng.to_move == 2
        assert len(eng.move_history) == 1
        eng.undo()
        assert eng.to_move == 1
        with pytest.raises(ValueError):
            eng.undo()

    def test_genmove_plays_legal(self):
        eng = Engine(CFG, SP, seed=3)
        for _ in range(6):
            if eng.game_over:
                break
            before = eng.legal_actions()
            action, result = eng.genmove(16)
            assert before[action]
            assert result.root_visits > 0
            assert result.move_infos
        assert len(eng.move_history) >= 1

    def test_analysis_fields(self):
        eng = Engine(CFG, SP)
        result = eng.analyze(32)
        # root visits = 1 (root eval) + playouts, KataGo's counting
        assert result.root_visits == 33
        top = result.move_infos[0]
        assert top.visits > 0
        assert 0.0 <= top.winrate <= 1.0
        assert top.pv[0] == top.move
        assert all(result.move_infos[i].order == i for i in range(len(result.move_infos)))

    def test_set_position(self):
        eng = Engine(CFG, SP)
        board = np.zeros((5, 5), np.int8)
        board[2, 2] = 1
        eng.set_position(board, to_move=2, last_move=(2, 2, 0))
        # white constrained to column 2
        assert eng.is_legal(2, 0, 1)
        assert not eng.is_legal(0, 0, 0)


def gtp_session(lines, **kw):
    from katacoffee_tpu.command.gtp import GTPEngine

    eng = GTPEngine(CFG, SP, max_visits=8, **kw)
    out = []
    for line in lines:
        r = eng.handle(line)
        if r == "":
            continue
        resp, quit_ = r
        out.append(resp)
        if quit_:
            break
    return out


class TestGTP:
    def test_basics(self):
        out = gtp_session(
            ["protocol_version", "name", "version", "known_command play",
             "known_command bogus", "1 list_commands", "quit"]
        )
        assert out[0] == "= 2"
        assert out[1].startswith("= ")
        assert out[3] == "= true"
        assert out[4] == "= false"
        assert out[5].startswith("=1 ")
        assert "genmove" in out[5]
        assert out[6] == "="

    def test_play_genmove_showboard(self):
        out = gtp_session(
            ["play B C3 north", "genmove white", "showboard", "debug_moves"]
        )
        assert out[0] == "="
        assert out[1].startswith("= ")
        move = out[1][2:]
        x, y, d = gio.parse_loc(move, CFG)
        assert x == 2  # constrained to column C by the north line
        assert "X" in out[2] and "O" in out[2]
        assert "C3 north" in out[3]

    def test_errors(self):
        out = gtp_session(["play B Z9 north", "play B C3 bogus", "bogus_cmd", "undo"])
        assert all(o.startswith("?") for o in out[:3])
        assert out[3].startswith("?")  # nothing to undo

    def test_id_echo(self):
        out = gtp_session(["7 name", "8 bogus"])
        assert out[0].startswith("=7")
        assert out[1].startswith("?8")

    def test_boardsize_komi_rules(self):
        out = gtp_session(
            ["boardsize 7", "komi 6.5", "get_komi", "kata-get-rules",
             "kata-set-param maxVisits 4", "kata-get-param maxVisits"]
        )
        assert out[0] == "="
        assert out[2] == "= 6.5"
        assert json.loads(out[3][2:])["game"] == "coffee"
        assert out[5] == "= 4"

    def test_set_position_and_final_score(self):
        out = gtp_session(
            ["set_position B C3 W D4", "final_score", "clear_board", "final_score"]
        )
        assert out[0] == "="
        assert out[1] == "= 0"

    def test_analyze_and_genmove_analyze(self):
        out = gtp_session(["play B C3 north", "kata-analyze interval 50",
                           "kata-genmove_analyze white"])
        assert out[1].startswith("= info move ")
        assert "winrate" in out[1] and "pv" in out[1]
        assert "\nplay " in out[2]

    def test_time_settings(self):
        out = gtp_session(
            ["kata-time_settings fischer 30 1", "time_left black 25.0",
             "genmove black"]
        )
        assert out[0] == "=" and out[1] == "="
        assert out[2].startswith("= ")

    def test_printsgf_loadsgf(self, tmp_path):
        from katacoffee_tpu.command.gtp import GTPEngine

        eng = GTPEngine(CFG, SP, max_visits=8)
        eng.handle("play B C3 north")
        eng.handle("play W C5 west")
        resp, _ = eng.handle("printsgf")
        sgf_text = resp[2:]
        assert sgf_text.startswith("(;FF[4]GM[Coffee]")
        p = tmp_path / "game.sgf"
        p.write_text(sgf_text + "\n")
        eng2 = GTPEngine(CFG, SP, max_visits=8)
        resp2, _ = eng2.handle(f"loadsgf {p}")
        assert resp2 == "="
        assert eng2.engine.move_history == eng.engine.move_history


class TestAnalysisEngine:
    def make(self):
        from katacoffee_tpu.command.analysis import AnalysisEngine

        return AnalysisEngine(SP, default_visits=8)

    def test_version_action(self):
        (r,) = self.make().handle_query({"id": "q", "action": "query_version"})
        assert r["id"] == "q" and "version" in r

    def test_basic_query(self):
        eng = self.make()
        results = eng.handle_query(
            {
                "id": "foo",
                "moves": [["B", "C3 north"], ["W", "C5 west"]],
                "boardXSize": 5,
                "boardYSize": 5,
                "rules": "coffee",
                "analyzeTurns": [0, 1, 2],
                "maxVisits": 8,
            }
        )
        assert len(results) == 3
        by_turn = {r["turnNumber"]: r for r in results}
        assert set(by_turn) == {0, 1, 2}
        for r in results:
            assert r["id"] == "foo"
            assert r["moveInfos"]
            mi = r["moveInfos"][0]
            assert mi["visits"] > 0 and 0 <= mi["winrate"] <= 1
            assert r["rootInfo"]["currentPlayer"] in ("B", "W")
        # turn 1: white constrained to column C
        for mi in by_turn[1]["moveInfos"]:
            assert mi["move"].startswith("C")

    def test_initial_stones_and_policy(self):
        eng = self.make()
        (r,) = eng.handle_query(
            {
                "id": "b",
                "moves": [],
                "initialStones": [["B", "C3"]],
                "initialPlayer": "W",
                "boardXSize": 5,
                "boardYSize": 5,
                "rules": {"winLen": 4},
                "includePolicy": True,
                "maxVisits": 4,
            }
        )
        assert r["rootInfo"]["currentPlayer"] == "W"
        assert len(r["policy"]) == CFG.policy_size

    def test_include_pv_visits(self):
        eng = self.make()
        (r,) = eng.handle_query(
            {
                "id": "pvv",
                "moves": [["B", "C3 north"]],
                "boardXSize": 5,
                "boardYSize": 5,
                "includePVVisits": True,
                "maxVisits": 32,
            }
        )
        for mi in r["moveInfos"]:
            assert len(mi["pvVisits"]) == len(mi["pv"])
            assert len(mi["pvEdgeVisits"]) == len(mi["pv"])
            # first entry is the child itself: edge visits = the move's visits
            assert mi["pvEdgeVisits"][0] == mi["visits"]
            # a node's visits dominate the edge visits into it (edge-visit
            # catch-up keeps edge <= child under transpositions)
            assert all(
                nv >= ev for nv, ev in zip(mi["pvVisits"], mi["pvEdgeVisits"])
            )
        # without the flag the fields stay absent (reference default)
        (r2,) = eng.handle_query(
            {"id": "pvv2", "moves": [["B", "C3 north"]], "maxVisits": 8}
        )
        assert "pvVisits" not in r2["moveInfos"][0]

    def test_errors(self):
        eng = self.make()
        (r,) = eng.handle_query({"id": "x", "moves": [["B", "Z9 north"]]})
        assert "error" in r
        results = eng.handle_query({"id": "y", "moves": [], "analyzeTurns": [5]})
        assert results[0]["error"] == "turn out of range"

    def test_jsonl_run(self, capsys):
        import io

        eng = self.make()
        inp = io.StringIO(
            json.dumps({"id": "a", "moves": [], "maxVisits": 4}) + "\n" + "not json\n"
        )
        out = io.StringIO()
        eng.run(inp, out)
        lines = [json.loads(l) for l in out.getvalue().splitlines()]
        # malformed lines error at ingest (before queued queries run)
        assert any("error" in l and "bad json" in l["error"] for l in lines)
        assert any(l.get("id") == "a" and "moveInfos" in l for l in lines)

    def test_logging_toggles(self, tmp_path):
        """logAllRequests/logAllResponses/logSearchInfo sinks
        (analysis.cpp:127-130 roles) write to the configured log file."""
        import io

        from katacoffee_tpu.utils import Logger

        eng = self.make()
        log_path = tmp_path / "analysis.log"
        logger = Logger()
        logger.add_file(str(log_path))
        eng.logger = logger
        eng.log_all_requests = True
        eng.log_all_responses = True
        eng.log_search_info = True
        inp = io.StringIO(
            json.dumps({"id": "a", "moves": [], "maxVisits": 4})
            + "\n"
            + json.dumps({"id": "bad", "moves": [["B", "Z9 north"]]})
            + "\n"
        )
        out = io.StringIO()
        eng.run(inp, out)
        text = log_path.read_text()
        assert 'Request: {"id": "a"' in text
        assert 'Search: queries=' in text
        assert '"moveInfos"' in text  # responses logged
        assert '"error"' in text  # errors logged

    def test_logger_from_config(self, tmp_path):
        """Logger.from_config honors logFile / logDir / logToStderr
        (logger.cpp config keys)."""
        from katacoffee_tpu.utils import ConfigParser, Logger

        d = tmp_path / "logs"
        c = ConfigParser(
            text=f"logFile = {tmp_path}/one.log\nlogDir = {d}\nlogToStderr = false\n"
        )
        lg = Logger.from_config(c)
        assert not lg.is_logging_to_stderr
        lg.write("hello sinks")
        lg.close()
        assert "hello sinks" in (tmp_path / "one.log").read_text()
        (logfile,) = list(d.iterdir())
        assert "hello sinks" in logfile.read_text()


class TestMatch:
    def test_uniform_selfmatch_is_fair(self):
        from katacoffee_tpu.program.match import run_match
        from katacoffee_tpu.search import uniform_eval_fn

        ev = uniform_eval_fn(CFG)
        result = run_match(CFG, SP, SP, ev, ev, num_games=32, num_visits=8, seed=0)
        assert result.games == 32
        assert result.wins_a + result.wins_b + result.draws == 32
        # identical bots: score should be near 0.5
        assert 0.2 < result.score_a < 0.8

    def test_sgf_records(self):
        from katacoffee_tpu.program.match import match_sgfs, run_match
        from katacoffee_tpu.dataio.sgf import parse_sgf
        from katacoffee_tpu.search import uniform_eval_fn
        from tests.oracle import OracleGame

        ev = uniform_eval_fn(CFG)
        result = run_match(
            CFG, SP, SP, ev, ev, num_games=4, num_visits=8, seed=1, record_moves=True
        )
        texts = match_sgfs(CFG, result, "botA", "botB")
        assert len(texts) == 4
        for g, text in enumerate(texts):
            sgf = parse_sgf(text)
            # replay through the oracle: every recorded move must be legal
            # and the recorded result must match
            game = OracleGame()
            for x, y, d, pla in sgf.moves():
                if game.done:
                    break
                assert pla == game.to_move
                assert game.is_legal(x, y, d)
                game.play(x, y, d)
            if game.done:
                want = {1: "B+", 2: "W+", 0: "0"}[game.winner]
                assert sgf.result() == want


class TestTimeControls:
    def test_fischer(self):
        tc = TimeControls.fischer(30.0, 2.0)
        t = tc.time_for_move(moves_left_estimate=10)
        assert 2.0 < t < 6.0
        tc.update_after_move(3.0)
        assert tc.main_time_left == pytest.approx(29.0)

    def test_byo_yomi(self):
        tc = TimeControls.byo_yomi(0.0, 5.0, 3)
        t = tc.time_for_move()
        assert 0 < t <= 5.0
        tc.update_after_move(12.0)  # blow through one period
        assert tc.periods_left <= 3

    def test_none_unlimited(self):
        tc = TimeControls()
        assert tc.time_for_move() == float("inf")
        assert visits_for_time(float("inf"), 100.0, 600) == 600

    def test_visits_conversion(self):
        assert visits_for_time(2.0, 100.0, 600) == 200
        assert visits_for_time(100.0, 100.0, 600) == 600
        assert visits_for_time(0.0, 100.0, 600) == 2


class TestTimeShaping:
    """searchtimehelpers.cpp formula parity (recomputeSearchTimeLimit,
    numVisitsNeededToBeNonFutile; params searchparams.h:127-148)."""

    def _sp(self, **kw):
        return SearchParams(**kw)

    def test_midgame_weight_formula(self):
        import math

        from katacoffee_tpu.search.timecontrols import midgame_weight

        sp = self._sp(midgameTimeFactor=1.5, midgameTurnPeakTime=130.0,
                      endgameTurnTimeDecay=100.0)
        area = 361  # scale 1.0 so the formula is direct
        # ramp: t < peak -> t/peak
        assert midgame_weight(sp, 65, area) == pytest.approx(0.5)
        # at peak -> exp(0) = 1
        assert midgame_weight(sp, 130, area) == pytest.approx(1.0)
        # decay: exp(-(t-peak)/decay)
        assert midgame_weight(sp, 230, area) == pytest.approx(math.exp(-1.0))
        # board-area scaling: peak scales by area/361
        small = midgame_weight(sp, 9, 25)  # peak = 130*25/361 = 9.002...
        assert small == pytest.approx(9 / (130 * 25 / 361))

    def test_obviousness_weight_formula(self):
        import math

        from katacoffee_tpu.search.timecontrols import obviousness_weight

        sp = self._sp(obviousMovesPolicyEntropyTolerance=0.30,
                      obviousMovesPolicySurpriseTolerance=0.15)
        # min of the two exponentials (searchtimehelpers.cpp:75-78)
        w = obviousness_weight(sp, 0.30, 0.15)
        assert w == pytest.approx(math.exp(-1.0))
        w = obviousness_weight(sp, 0.0, 0.30)
        assert w == pytest.approx(min(1.0, math.exp(-2.0)))

    def test_shaped_budget(self):
        from katacoffee_tpu.search.timecontrols import shaped_time_budget

        # neutral params -> identity
        sp = self._sp()
        assert shaped_time_budget(sp, 10.0, 50, 25) == pytest.approx(10.0)
        # overallocate multiplies; midgame factor interpolates by weight
        sp = self._sp(overallocateTimeFactor=1.2, midgameTimeFactor=2.0,
                      midgameTurnPeakTime=130.0, endgameTurnTimeDecay=100.0)
        t = shaped_time_budget(sp, 10.0, 130 * 25 // 361, 25)
        # at (approximately) the scaled peak, weight ~ 1 -> x2
        assert t > 10.0 * 1.2 * 1.8
        # obvious-move discount applies only when entropy+surprise given
        sp = self._sp(obviousMovesTimeFactor=0.5)
        full = shaped_time_budget(sp, 10.0, 5, 25)
        disc = shaped_time_budget(sp, 10.0, 5, 25, policy_entropy=0.0, policy_surprise=0.0)
        assert full == pytest.approx(10.0)
        assert disc == pytest.approx(5.0)  # weight 1 -> 1 + 1*(0.5-1) = 0.5

    def test_futile_visits(self):
        from katacoffee_tpu.search.timecontrols import (
            is_search_futile,
            num_visits_needed_to_be_non_futile,
        )

        sp = self._sp(futileVisitsThreshold=0.5)
        # temp 0: required = threshold * maxVisits
        assert num_visits_needed_to_be_non_futile(sp, 100.0, 0.0) == pytest.approx(50.0)
        # high temperature lowers the requirement via 0.01^temp
        assert num_visits_needed_to_be_non_futile(sp, 100.0, 1.0) == pytest.approx(1.0)
        # futile: best==max-visits move, no alternative can reach 50
        assert is_search_futile(sp, [100, 10, 5], [100, 10, 5], 20.0, 0.0)
        # not futile: an alternative can still reach the requirement
        assert not is_search_futile(sp, [100, 40, 5], [100, 40, 5], 20.0, 0.0)
        # not futile when the selected move is not the most-visited one
        assert not is_search_futile(sp, [100, 10], [10, 100], 20.0, 0.0)
        # threshold 0 disables
        sp0 = self._sp()
        assert not is_search_futile(sp0, [100, 1], [100, 1], 0.0, 0.0)

    def test_interpolate_early(self):
        from katacoffee_tpu.search.timecontrols import interpolate_early

        assert interpolate_early(19.0, 0.8, 0.2, 0) == pytest.approx(0.8)
        assert interpolate_early(19.0, 0.8, 0.2, 19) == pytest.approx(0.5)
        assert interpolate_early(19.0, 0.8, 0.2, 1e9) == pytest.approx(0.2)


class TestGTPStreamingAndAvoid:
    def _run_session(self, text, max_visits=24):
        import io

        from katacoffee_tpu.command.gtp import GTPEngine

        eng = GTPEngine(CFG, SP, max_visits=max_visits)
        inf, outf = io.StringIO(text), io.StringIO()
        eng.run(inf, outf)
        return outf.getvalue()

    def test_kata_analyze_interval_streams(self):
        out = self._run_session("play B C3 north\nkata-analyze interval 1\nquit\n")
        # streamed response: '=' line then >=2 interval reports
        lines = out.splitlines()
        infos = [l for l in lines if l.startswith("info move ")]
        assert len(infos) >= 2, out

    def test_genmove_analyze_interval_streams_and_plays(self):
        out = self._run_session(
            "play B C3 north\nkata-genmove_analyze white interval 1\nquit\n"
        )
        infos = [l for l in out.splitlines() if l.startswith("info move ")]
        plays = [l for l in out.splitlines() if l.startswith("play ")]
        assert len(infos) >= 2, out
        assert len(plays) == 1, out

    def test_avoid_moves(self):
        # white constrained to column C after B C3 north; forbid C4N
        out = gtp_session(
            ["play B C3 north", "kata-analyze white avoid W C4N 1"],
        )
        rep = out[1]
        assert rep.startswith("= info move") or rep.startswith("="), rep
        assert "move C4N " not in rep

    def test_allow_moves(self):
        out = gtp_session(
            ["play B C3 north", "kata-analyze white allow W C4N 1"],
        )
        rep = out[1]
        # only the allowed move may appear
        import re

        moves = re.findall(r"info move (\S+)", rep)
        assert moves == ["C4N"], rep

    def test_avoid_all_falls_back(self):
        # masking every legal move is ignored (reference fallback)
        legal_cols = "C1N,C2N,C4N,C5N,C1NW,C2NW,C4NW,C5NW,C1NE,C2NE,C4NE,C5NE,C1W,C2W,C4W,C5W"
        out = gtp_session(["play B C3 north", f"kata-analyze white avoid W {legal_cols} 1"])
        assert "info move" in out[1]

    def test_kata_raw_nn(self):
        # raw-head output under symmetry 0 / all (gtp.cpp:1474 rawNN)
        def stub_fwd(states):
            import jax.numpy as jnp

            B = states.to_move.shape[0]
            return {
                "policy_logits": jnp.zeros((B, CFG.policy_size)),
                "value_logits": jnp.asarray([[0.3, 0.2, 0.5]] * B),
                "var_time_left": jnp.full((B,), 4.0),
                "shortterm_error": jnp.full((B,), 0.1),
                "ownership": jnp.zeros((B, CFG.y_size, CFG.x_size)),
            }

        out = gtp_session(
            ["play B C3 north", "kata-raw-nn 0", "kata-raw-nn all", "kata-raw-nn 9"],
            raw_fwd=stub_fwd,
        )
        assert out[1].startswith("= symmetry 0")
        assert "whiteWin" in out[1] and "whiteOwnership" in out[1]
        # uniform legal policy: 16 legal col-C moves -> 0.0625 each, NAN elsewhere
        assert out[1].count("0.062500") == 16
        assert "NAN" in out[1]
        assert out[2].count("symmetry ") == 8
        assert out[3].startswith("?")  # bad symmetry index

    def test_kata_analyze_ownership(self):
        # `ownership true` appends H*W tanh'd TREE-AVERAGED values
        # (gtp.cpp:826-833 getAverageTreeOwnership). The stub encodes "white
        # owns everything at logit 0.5" in each node's OWN mover perspective;
        # the averaging must sign-align the per-node maps to the root mover
        # (white after B C3), so every averaged value is exactly tanh(0.5).
        import re

        def stub_fwd(states):
            import jax.numpy as jnp

            val = jnp.where(states.to_move == 2, 0.5, -0.5).astype(jnp.float32)
            B = val.shape[0]
            return {
                "ownership": jnp.broadcast_to(
                    val[:, None, None], (B, CFG.y_size, CFG.x_size)
                )
            }

        out = gtp_session(
            ["play B C3 north", "kata-analyze ownership true 1"],
            raw_fwd=stub_fwd,
        )
        m = re.search(r" ownership((?: -?\d\.\d{4})+)", out[1])
        assert m, out[1]
        vals = m.group(1).split()
        assert len(vals) == CFG.area
        assert all(abs(float(v) - 0.4621) < 1e-3 for v in vals)
        # without the flag (or without a model), no ownership field
        out2 = gtp_session(["play B C3 north", "kata-analyze 1"], raw_fwd=stub_fwd)
        assert " ownership " not in out2[1]


class TestAnalysisAvoidAndStreaming:
    def _engine(self):
        from katacoffee_tpu.command.analysis import AnalysisEngine

        return AnalysisEngine(SP, default_visits=16)

    def test_avoid_moves_json(self):
        eng = self._engine()
        results = list(eng.handle_query({
            "id": "q", "moves": [["B", "C3N"]], "maxVisits": 16,
            "avoidMoves": [{"player": "W", "moves": ["C4N"], "untilDepth": 1}],
        }))
        (r,) = [r for r in results if r.get("moveInfos") is not None]
        assert all(mi["move"] != "C4N" for mi in r["moveInfos"]), r

    def test_allow_moves_json(self):
        eng = self._engine()
        results = list(eng.handle_query({
            "id": "q", "moves": [["B", "C3N"]], "maxVisits": 16,
            "allowMoves": [{"player": "W", "moves": ["C4N"], "untilDepth": 1}],
        }))
        (r,) = [r for r in results if r.get("moveInfos") is not None]
        assert [mi["move"] for mi in r["moveInfos"]] == ["C4N"], r

    def test_report_during_search(self):
        eng = self._engine()
        results = list(eng.handle_query({
            "id": "q", "moves": [["B", "C3N"]], "maxVisits": 24,
            "reportDuringSearchEvery": 1e-9,
        }))
        during = [r for r in results if r.get("isDuringSearch")]
        finals = [r for r in results if r.get("isDuringSearch") is False and "moveInfos" in r]
        assert len(during) >= 1, results
        assert len(finals) == 1, results


class TestStartposCommands:
    """viewstartposes / trystartposes / sampleinitializations
    (misc.cpp:2230,2388,2544)."""

    @pytest.fixture()
    def sgf_dir(self, tmp_path):
        import random

        from katacoffee_tpu.dataio.sgf import write_sgf
        from tests.oracle import OracleGame

        d = tmp_path / "sgfs"
        d.mkdir()
        rnd = random.Random(11)
        g = OracleGame()
        mv = []
        while not g.done:
            x, y, dd = rnd.choice(g.legal_moves())
            mv.append((x, y, dd, g.to_move))
            g.play(x, y, dd)
        (d / "g.sgf").write_text(write_sgf(5, 5, 4, mv, "a", "b", winner=g.winner) + "\n")
        return str(d)

    def test_viewstartposes(self, sgf_dir, capsys):
        from katacoffee_tpu.command.misc import main_viewstartposes

        main_viewstartposes(["-start-poses-dir", sgf_dir, "-idx", "0"])
        out = capsys.readouterr().out
        assert "startpos 0" in out and "hint" in out and "positions" in out

    def test_trystartposes(self, sgf_dir, capsys):
        from katacoffee_tpu.command.misc import main_trystartposes

        main_trystartposes(
            ["-start-poses-dir", sgf_dir, "-visits", "12", "-max-positions", "3"]
        )
        out = capsys.readouterr().out
        assert "tried 3 positions at 12 visits" in out
        assert "move " in out and "wl " in out

    def test_sampleinitializations(self, capsys):
        from katacoffee_tpu.command.misc import main_sampleinitializations

        main_sampleinitializations(["-num", "3", "-evaluate", "-seed", "2"])
        out = capsys.readouterr().out
        assert out.count("initialization ") == 3
        assert "raw wl" in out
