"""Pondering + interactive tree reuse (the reference's AsyncBot ponder path,
`cpp/search/asyncbot.cpp`, enabled by `ponderingEnabled`,
`cpp/configs/gtp_example.cfg:290-296`).

TPU-native shape: between GTP commands the host runs extra compiled search
chunks on the current position (Engine.ponder_stream); the retained tree is
advanced through played moves (beginSearch tree reuse, search.cpp:262-331)
and the next genmove continues from it, so ponder visits count toward its
maxVisits budget — that is the first-move-latency benefit, asserted here via
visit accounting (no flaky wall-clock asserts; the real-chip latency demo is
tools/ponder_demo.py)."""

import io
import os
import threading

import jax
import numpy as np

from katacoffee_tpu.game import GameConfig
from katacoffee_tpu.program.engine import Engine
from katacoffee_tpu.search import SearchParams, mcts

CFG = GameConfig(5, 5, 4)


def _engine(ponder: bool) -> Engine:
    sp = SearchParams.for_tests_v2()
    eng = Engine(CFG, sp, mcts.uniform_eval_fn(CFG), seed=5)
    if ponder:
        eng.reuse_enabled = True
        eng.min_reuse_cap = Engine._bucket_cap(40)
    return eng


def test_ponder_accumulates_and_genmove_reuses():
    eng = _engine(ponder=True)
    eng.play(2, 2, 0)  # opponent opening; now pondering our reply's position

    # ponder the current position to >= 40 visits
    last = 0
    for _tree, done in eng.ponder_stream(40, interval_visits=16):
        last = done
    assert last >= 40
    tree, cap = eng._reuse
    assert int(np.asarray(tree.visits[0, 0])) == last

    # genmove with a budget BELOW the pondered visits: must consume the
    # retained tree and add no playouts (maxVisits counts reused visits,
    # search.cpp beginSearch semantics) — the latency win, in visit units
    action, _res = eng.genmove(20, play=False)
    t2 = eng.last_tree
    assert int(np.asarray(t2.visits[0, 0])) == last, "no extra playouts needed"
    legal = eng.legal_actions()
    assert legal[action]

    # playing a move advances the retained tree to the new position: its
    # root state must equal the engine position (or be a fresh re-eval of it)
    area = CFG.area
    d, spot = action // area, action % area
    eng.play(spot % CFG.x_size, spot // CFG.x_size, d)
    tree, cap = eng._reuse
    np.testing.assert_array_equal(
        np.asarray(tree.states.board[0, 0]), np.asarray(eng.state.board)
    )
    assert int(np.asarray(tree.states.to_move[0, 0])) == eng.to_move
    # the chosen child's subtree survives re-rooting: root visits > 1
    assert int(np.asarray(tree.visits[0, 0])) >= 1

    # a genmove at the advanced position tops the reused tree up to its own
    # budget exactly (total-visit semantics)
    action2, _ = eng.genmove(30, play=False)
    assert int(np.asarray(eng.last_tree.visits[0, 0])) >= 31


def test_reuse_dropped_on_position_edits():
    eng = _engine(ponder=True)
    for _ in eng.ponder_stream(16, interval_visits=8):
        pass
    assert eng._reuse is not None
    eng.set_to_move(2)
    assert eng._reuse is None
    for _ in eng.ponder_stream(16, interval_visits=8):
        pass
    assert eng._reuse is not None
    eng.clear_board()
    assert eng._reuse is None


def test_ponder_off_is_unchanged():
    """Default engines keep the fresh-search path: no retained tree."""
    eng = _engine(ponder=False)
    eng.genmove(12, play=False)
    assert eng._reuse is None


def test_gtp_ponders_between_commands():
    """GTP loop with a real pipe: after `genmove`, the engine ponders while
    stdin is idle and stops when the next command arrives (or the ponder
    budget is met)."""
    from katacoffee_tpu.command.gtp import GTPEngine

    sp = SearchParams.for_tests_v2()
    gtp = GTPEngine(
        CFG, sp, mcts.uniform_eval_fn(CFG), max_visits=12, seed=3,
        ponder_enabled=True, max_visits_pondering=24,
    )
    r_fd, w_fd = os.pipe()
    infile = os.fdopen(r_fd, "r")
    out = io.StringIO()
    w = os.fdopen(w_fd, "w")

    def feed():
        w.write("genmove b\n")
        w.flush()
        # no further input until the ponder budget is exhausted; then quit
        while gtp._ponder_last == 0:
            ev.wait(0.05)
        w.write("quit\n")
        w.flush()

    ev = threading.Event()
    t = threading.Thread(target=feed, daemon=True)
    t.start()
    gtp.run(infile=infile, outfile=out)
    t.join(timeout=10)
    resp = out.getvalue()
    assert resp.startswith("= ")
    # pondering ran to its budget (24+1 total root visits) before quit
    assert gtp._ponder_last >= 24
    # and the retained tree is at the post-move position
    tree, _cap = gtp.engine._reuse
    np.testing.assert_array_equal(
        np.asarray(tree.states.board[0, 0]), np.asarray(gtp.engine.state.board)
    )


def test_gtp_ponder_skips_nonselectable_stdin():
    """StringIO driver (the golden-test harness shape): pondering must not
    block or error — input_waiting reports pending and the loop exits."""
    from katacoffee_tpu.command.gtp import GTPEngine

    sp = SearchParams.for_tests_v2()
    gtp = GTPEngine(
        CFG, sp, mcts.uniform_eval_fn(CFG), max_visits=8, seed=3,
        ponder_enabled=True, max_visits_pondering=16,
    )
    infile = io.StringIO("genmove b\nquit\n")
    out = io.StringIO()
    gtp.run(infile=infile, outfile=out)
    assert out.getvalue().startswith("= ")
