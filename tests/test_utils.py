"""Tests for core utilities: config parser (reference tier-1 testconfig.cpp
analogue), Elo MLE fitting (core/elo.cpp analogue)."""

import math

import numpy as np
import pytest

from katacoffee_tpu.utils import ConfigError, ConfigParser, compute_elos


class TestConfigParser:
    def test_basic_types(self, tmp_path):
        p = tmp_path / "a.cfg"
        p.write_text(
            """
# comment
numSearchThreads = 8   # trailing comment
maxVisits = 600
winRate = 0.5
useLcb = true
name = hello world
sizes = 5,7 9
"""
        )
        c = ConfigParser(str(p))
        assert c.get_int("numSearchThreads") == 8
        assert c.get_int("maxVisits", min=1, max=1000) == 600
        assert c.get_float("winRate") == 0.5
        assert c.get_bool("useLcb") is True
        assert c.get_string("name") == "hello world"
        assert c.get_ints("sizes") == [5, 7, 9]
        assert c.unused_keys() == []

    def test_includes_and_override_order(self, tmp_path):
        (tmp_path / "base.cfg").write_text("x = 1\ny = 2\n")
        (tmp_path / "main.cfg").write_text("@include base.cfg\nx = 3\n")
        c = ConfigParser(str(tmp_path / "main.cfg"))
        assert c.get_int("x") == 3  # later keys override earlier
        assert c.get_int("y") == 2

    def test_circular_include(self, tmp_path):
        (tmp_path / "a.cfg").write_text("@include b.cfg\n")
        (tmp_path / "b.cfg").write_text("@include a.cfg\n")
        with pytest.raises(ConfigError, match="[Cc]ircular"):
            ConfigParser(str(tmp_path / "a.cfg"))

    def test_override_string(self):
        c = ConfigParser(text="a = 1\nb = 2\n", overrides="b=5,c=7")
        assert c.get_int("a") == 1
        assert c.get_int("b") == 5
        assert c.get_int("c") == 7

    def test_unused_warning_and_errors(self):
        c = ConfigParser(text="a = 1\nb = x\n")
        c.get_int("a")
        assert c.unused_keys() == ["b"]
        with pytest.raises(ConfigError):
            c.get_int("b")
        with pytest.raises(ConfigError):
            c.get_int("a", min=5)
        with pytest.raises(ConfigError):
            c.get_int("missing")
        assert c.get_int("missing", default=9) == 9

    def test_bad_lines(self):
        with pytest.raises(ConfigError):
            ConfigParser(text="novalue\n")


class TestElo:
    def test_two_players(self):
        # A beats B 75% of the time -> elo gap ~ 400*log10(3) ~ 190.8
        recs = [("A", "B", 75, 25, 0)]
        res = compute_elos(recs, prior_games=0.5)
        gap = res.as_dict()["A"][0] - res.as_dict()["B"][0]
        assert abs(gap - 400 * math.log10(3)) < 12.0  # prior pulls slightly

    def test_transitive_chain(self):
        recs = [("A", "B", 70, 30, 0), ("B", "C", 70, 30, 0)]
        res = compute_elos(recs)
        d = res.as_dict()
        assert d["A"][0] > d["B"][0] > d["C"][0]

    def test_draws_count_half(self):
        even = compute_elos([("A", "B", 10, 10, 0)]).as_dict()
        drawn = compute_elos([("A", "B", 0, 0, 20)]).as_dict()
        assert abs(even["A"][0] - even["B"][0]) < 1.0
        assert abs(drawn["A"][0] - drawn["B"][0]) < 1.0

    def test_stdev_shrinks_with_games(self):
        few = compute_elos([("A", "B", 5, 5, 0)]).as_dict()
        many = compute_elos([("A", "B", 500, 500, 0)]).as_dict()
        assert many["A"][1] < few["A"][1]

    def test_empty(self):
        res = compute_elos([])
        assert res.players == []
