"""Opening book tests: canonical symmetry keys, batched expansion,
save/load round-trip, consistency check, HTML export."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.book import Book, build_book
from katacoffee_tpu.game import symmetry as S
from katacoffee_tpu.game.board import GameConfig, init_state, step
from katacoffee_tpu.search import SearchParams, uniform_eval_fn

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0)


def small_book(rounds=2, batch=8, visits=48, seed=0):
    return build_book(
        CFG, SP, uniform_eval_fn(CFG),
        num_rounds=rounds, batch_size=batch, num_visits=visits,
        seed=seed, log=lambda *a: None,
    )


class TestBook:
    def test_build_and_expand(self):
        book = small_book()
        assert len(book.nodes) > 8
        root = book.nodes[book.root_key]
        assert root.expanded
        assert root.edges
        assert root.visits > 0
        assert book.check() == []

    def test_symmetric_positions_merge(self):
        """The 8 dihedral images of one opening line must share a node."""
        book = Book(CFG)
        s = init_state(CFG)
        a = 2 * 25 + 1 * 5 + 1  # B2 northwest
        st = step(CFG, s, jnp.asarray(a, jnp.int32))
        k1 = book._add_state(st, 0.5)
        # the symmetric image of the same move
        for sym in range(1, S.NUM_SYMMETRIES):
            sa = int(S.apply_action(CFG, sym, jnp.asarray(a)))
            st2 = step(CFG, s, jnp.asarray(sa, jnp.int32))
            k2 = book._add_state(st2, 0.5)
            assert k2 == k1, sym

    def test_save_load_roundtrip(self, tmp_path):
        book = small_book()
        path = str(tmp_path / "book.json")
        book.save(path)
        loaded = Book.load(path)
        assert loaded.root_key == book.root_key
        assert set(loaded.nodes) == set(book.nodes)
        n1 = book.nodes[book.root_key]
        n2 = loaded.nodes[book.root_key]
        assert n1.edges == n2.edges
        assert n1.winloss == n2.winloss
        assert loaded.check() == []

    def test_best_line_is_legal(self):
        from tests.oracle import OracleGame

        book = small_book(rounds=3)
        line = book.best_line()
        assert line
        g = OracleGame()
        for key, a in line:
            # actions are in each node's canonical orientation, so replay
            # node-by-node instead of as one game: the move must be legal in
            # the node's own position
            node = book.nodes[key]
            g2 = OracleGame()
            g2.board = [row[:] for row in node.board]
            g2.to_move = node.to_move
            if node.last_spot >= 0:
                g2.last_xy = (node.last_spot % 5, node.last_spot // 5)
                g2.last_dir = node.last_dir
            d, spot = a // 25, a % 25
            assert g2.is_legal(spot % 5, spot // 5, d)

    def test_html_export(self, tmp_path):
        book = small_book()
        out = str(tmp_path / "html")
        book.export_html(out)
        assert os.path.exists(os.path.join(out, "index.html"))
        root_page = os.path.join(out, f"{book.root_key}.html")
        assert os.path.exists(root_page)
        text = open(root_page).read()
        assert "winloss" in text and "<table" in text
        # bookcssjs.cpp-role rendering: SVG board, PV, navigation, index
        assert '<svg class="board"' in text
        assert "list.html" in text
        assert os.path.exists(os.path.join(out, "list.html"))
        # child rows link to child pages and carry negated child book values
        import re

        links = re.findall(r'href="([0-9a-f]+)\.html"', text)
        assert any(k != book.root_key and k in book.nodes for k in links)


class TestWideningAndRecompute:
    def test_widening_adds_new_edges(self):
        """An expanded node with unexpanded policy mass re-enters the
        frontier (bonusPerExcessUnexpandedPolicy role) and a second pass
        adds moves the first top_k cut off."""
        book = Book(CFG)
        rng = jax.random.PRNGKey(0)
        ev = uniform_eval_fn(CFG)
        book.expand([book.root_key], SP, ev, 48, rng, top_k=2)
        root = book.nodes[book.root_key]
        first = set(root.edges)
        assert len(first) == 2
        assert root.unexpanded_mass > 0.5  # 25 uniform first moves, 2 booked
        assert book.root_key in book.frontier(100)
        assert book.root_key not in book.frontier(100, widen=False)
        book.expand([book.root_key], SP, ev, 48, jax.random.PRNGKey(1), top_k=4)
        assert len(root.edges) > len(first)
        assert first <= set(root.edges)  # widening keeps existing edges
        # a node whose widening pass adds nothing retires from the frontier
        root.unexpanded_mass = 0.01
        assert book.root_key not in book.frontier(100)

    def test_recompute_negamax(self):
        """book_wl = max(own search value, negamax over children)
        (recomputeNodeValues, book.cpp:1277-1380)."""
        book = Book(CFG)
        s = init_state(CFG)
        st1 = step(CFG, s, jnp.asarray(0))
        k1 = book._add_state(st1, 0.5)
        st2 = step(CFG, s, jnp.asarray(6))
        k2 = book._add_state(st2, 0.5)
        root = book.nodes[book.root_key]
        root.expanded = True
        root.winloss = 0.1
        root.visits = 10
        root.edges = {0: (k1, 0.5, 5), 6: (k2, 0.4, 3)}
        book.nodes[k1].winloss = -0.8  # losing for its mover => +0.8 for root
        book.nodes[k1].visits = 5
        book.nodes[k2].winloss = 0.3
        book.nodes[k2].visits = 3
        book.recompute()
        assert root.book_wl == 0.8
        assert book.nodes[k1].book_wl == -0.8  # leaf: own value
        assert root.rec_visits == 18
        assert book.check() == []
        # floor: if every child is bad, the node's own value wins
        book.nodes[k1].winloss = 0.5
        book.nodes[k2].winloss = 0.5
        book.recompute()
        assert root.book_wl == 0.1

    def test_built_book_recomputed(self):
        book = small_book(rounds=3)
        assert all(n.book_wl is not None for n in book.nodes.values())
        root = book.nodes[book.root_key]
        assert root.rec_visits >= root.visits
        assert book.check() == []


class TestCostModel:
    """Expansion priority = path_prob x exp(-wl_cost/scale)
    (book.cpp cost-model role)."""

    def test_frontier_prefers_cheap_lines(self):
        import jax.numpy as jnp

        from katacoffee_tpu.book.book import Book
        from katacoffee_tpu.game.board import init_state, step

        book = Book(CFG)
        s = init_state(CFG)
        # three children of the root with equal path probability but
        # different accumulated costs
        keys = []
        for i, (a, cost) in enumerate([(0, 0.0), (1, 0.30), (2, 0.05)]):
            st = step(CFG, s, jnp.asarray(a))
            keys.append(book._add_state(st, path_prob=0.2, wl_cost=cost))
        book.nodes[book.root_key].expanded = True
        frontier = book.frontier(3)
        got = [book.nodes[k].wl_cost for k in frontier]
        assert got == sorted(got), got

    def test_wl_cost_roundtrips_and_min_merges(self, tmp_path):
        import jax.numpy as jnp

        from katacoffee_tpu.book.book import Book
        from katacoffee_tpu.game.board import init_state, step

        book = Book(CFG)
        st = step(CFG, init_state(CFG), jnp.asarray(3))
        k = book._add_state(st, 0.1, wl_cost=0.4)
        # reached again via a cheaper path: cost takes the min
        k2 = book._add_state(st, 0.05, wl_cost=0.1)
        assert k == k2
        assert book.nodes[k].wl_cost == 0.1
        p = str(tmp_path / "b.json")
        book.save(p)
        loaded = Book.load(p)
        assert loaded.nodes[k].wl_cost == 0.1
