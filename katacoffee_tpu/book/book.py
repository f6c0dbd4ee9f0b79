"""Opening book for Coffee: a symmetry-reduced position DAG with search
values, expanded by batched on-device search.

Reference equivalents (`cpp/book/book.{h,cpp}`, `cpp/command/genbook.cpp`):
  * BookHash → canonical situation hash over the 8 dihedral symmetries
    (min of the transformed hashes, with the direction remap of
    SymmetryHelpers::getSymDir handled by game/symmetry.py);
  * node values from search (winloss from the node mover's perspective,
    visits), edges by raw action in a canonical orientation;
  * expansion policy → the reference ranks nodes by an elaborate cost model
    (book.cpp: costPerMove compounding with move probabilities plus
    biggestWLCostFromRoot penalties); we use a documented two-factor form
    of the same idea: priority = path-probability × exp(−wl_cost/scale),
    where path probability multiplies the parents' policy priors and
    wl_cost accumulates, along the cheapest path, how much search utility
    each ancestor's move sacrificed vs its best sibling — top-of-book and
    near-optimal lines get the visits, refuted lines decay exponentially;
    expanded nodes with leftover policy mass re-enter the frontier for
    widening (bonusPerExcessUnexpandedPolicy role, book.h:285);
  * recursive values → recompute() negamaxes winloss over children with the
    node's own search value as floor (recomputeNodeValues, book.cpp:1277);
  * persistence: one JSON file (the reference's .katabook binary is a
    serialization detail, not a capability);
  * writebook → static HTML export (bookcssjs.cpp equivalent).

TPU design: each expansion round gathers up to `batch_size` frontier
positions and evaluates them with ONE batched search call — the reference
needs a thread pool per position (genbook.cpp), here the batch axis does it.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import io as gio
from katacoffee_tpu.game import symmetry as S
from katacoffee_tpu.game.board import GameConfig, GameState, init_state, situation_hash, step
from katacoffee_tpu.search import SearchParams, mcts


def _canonical_key(cfg: GameConfig, state: GameState) -> tuple[str, int]:
    """(canonical hash hex, symmetry mapping state->canonical)."""
    best = None
    best_sym = 0
    for sym in range(S.num_symmetries(cfg)):
        st = S.apply_state(cfg, sym, state)
        h = np.asarray(situation_hash(cfg, st))
        key = f"{int(h[0]):08x}{int(h[1]):08x}"
        if best is None or key < best:
            best, best_sym = key, sym
    return best, best_sym


@dataclasses.dataclass
class BookNode:
    key: str
    board: list  # [Y][X] ints, canonical orientation
    to_move: int
    last_spot: int
    last_dir: int
    num_turns: int
    winloss: float = 0.0  # mover perspective, from search
    draw: float = 0.0
    visits: int = 0
    path_prob: float = 0.0  # max product of priors from the root
    # Accumulated utility sacrificed vs best play on the cheapest root path
    # reaching this node (the reference cost model's biggestWLCostFromRoot
    # ingredient, book.cpp): at each ancestor, how much worse the taken
    # child's search utility was than the best sibling's. Near-optimal lines
    # get deep expansion; refuted lines decay exponentially.
    wl_cost: float = 0.0
    expanded: bool = False
    # Policy mass of legal moves NOT yet in edges (the reference's
    # bonusPerExcessUnexpandedPolicy ingredient, book.h:285): expanded nodes
    # with meaningful unexpanded mass re-enter the frontier for widening.
    unexpanded_mass: float = 1.0
    # Recursive book value: negamax over the expanded children's book values,
    # floored by the node's own search value (recomputeNodeValues,
    # book.cpp:1277-1380). None until recompute() runs.
    book_wl: float | None = None
    rec_visits: int = 0  # recursive subtree visits (recursiveValues.visits)
    edges: dict = dataclasses.field(default_factory=dict)  # action -> (child key, prior, visits)

    def state(self, cfg: GameConfig) -> GameState:
        base = init_state(cfg)
        st = base._replace(
            board=jnp.asarray(np.array(self.board, np.int8)),
            to_move=jnp.asarray(self.to_move, jnp.int8),
            num_turns=jnp.asarray(self.num_turns, jnp.int32),
        )
        if self.last_spot >= 0:
            st = st._replace(
                last_spot=jnp.asarray(self.last_spot, jnp.int32),
                last_dir=jnp.asarray(self.last_dir, jnp.int32),
                recent_spots=st.recent_spots.at[0].set(self.last_spot),
                recent_dirs=st.recent_dirs.at[0].set(self.last_dir),
            )
        return st


class Book:
    def __init__(self, cfg: GameConfig):
        self.cfg = cfg
        self.nodes: dict[str, BookNode] = {}
        self._search_cache: dict[tuple, object] = {}
        root_state = init_state(cfg)
        self.root_key = self._add_state(root_state, path_prob=1.0)

    def _add_state(self, state: GameState, path_prob: float, wl_cost: float = 0.0) -> str:
        key, sym = _canonical_key(self.cfg, state)
        if key in self.nodes:
            node = self.nodes[key]
            node.path_prob = max(node.path_prob, path_prob)
            node.wl_cost = min(node.wl_cost, wl_cost)
            return key
        canon = S.apply_state(self.cfg, sym, state)
        self.nodes[key] = BookNode(
            key=key,
            board=np.asarray(canon.board).tolist(),
            to_move=int(canon.to_move),
            last_spot=int(canon.last_spot),
            last_dir=int(canon.last_dir),
            num_turns=int(canon.num_turns),
            path_prob=path_prob,
            wl_cost=wl_cost,
        )
        return key

    # ------------------------------------------------------------------

    # frontier priority = reach probability discounted by the line's
    # accumulated utility sacrifice (exp(-wl_cost/scale) — the documented
    # simplification of the reference's per-node cost model, book.cpp:
    # costPerMove × move-prob compounding × biggestWLCostFromRoot penalty)
    COST_SCALE = 0.15
    # Widening (bonusPerExcessUnexpandedPolicy role): an expanded node
    # re-enters the frontier at priority × WIDEN_FACTOR × unexpanded policy
    # mass, once that mass exceeds MIN_WIDEN_MASS. Expanding it again adds
    # the next-best moves the first pass cut off.
    WIDEN_FACTOR = 0.25
    MIN_WIDEN_MASS = 0.05

    def _priority(self, n: BookNode) -> float:
        p = n.path_prob * math.exp(-max(n.wl_cost, 0.0) / self.COST_SCALE)
        if n.expanded:
            p *= self.WIDEN_FACTOR * n.unexpanded_mass
        return p

    def frontier(self, limit: int, widen: bool = True) -> list[str]:
        """Expansion candidates ranked by reach-probability × line-quality
        (see _priority): unexpanded nodes, plus (with `widen`) expanded
        nodes whose unexpanded policy mass still exceeds MIN_WIDEN_MASS."""
        cand = [
            n
            for n in self.nodes.values()
            if not n.expanded
            or (widen and n.edges and n.unexpanded_mass > self.MIN_WIDEN_MASS)
        ]
        cand.sort(key=lambda n: -self._priority(n))
        return [n.key for n in cand[:limit]]

    def expand(
        self,
        keys: list[str],
        sp: SearchParams,
        eval_fn,
        num_visits: int,
        rng,
        top_k: int = 4,
        min_prior: float = 0.02,
    ):
        """Expand the given nodes with ONE batched search call."""
        if not keys:
            return
        cfg = self.cfg
        # pad to a stable batch size so the search compiles once
        n_real = len(keys)
        pad = (-n_real) % max(8, 1 << (n_real - 1).bit_length()) if n_real > 1 else 0
        keys_padded = list(keys) + [keys[-1]] * pad
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[self.nodes[k].state(cfg) for k in keys_padded]
        )
        ck = (sp, num_visits, len(keys_padded), id(eval_fn))
        search = self._search_cache.get(ck)
        if search is None:
            search = jax.jit(
                lambda s, k: mcts.run_search(cfg, sp, eval_fn, s, num_visits, k)
            )
            self._search_cache[ck] = search
        tree = search(states, rng)
        vals = mcts.root_values(tree)
        rv = np.asarray(mcts.root_visit_counts(tree))  # [B, A]
        priors = np.asarray(jnp.maximum(tree.prior[:, 0], 0.0))
        wl = np.asarray(vals["root_wl"])
        draw = np.asarray(vals["root_draw"])
        child_u = np.asarray(vals["child_utility"])  # parent persp.
        child_wl = np.asarray(vals["child_wl"])  # parent persp.

        step1 = jax.jit(lambda s, a: step(cfg, s, a))
        for i, k in enumerate(keys):
            node = self.nodes[k]
            had_edges = len(node.edges)
            node.winloss = float(wl[i])
            node.draw = float(draw[i])
            node.visits += num_visits
            node.expanded = True
            # top moves by search visits (at least min_prior or visited)
            order = np.argsort(-rv[i])
            added = 0
            st = node.state(cfg)
            # best searched child utility (parent perspective) anchors the
            # per-edge sacrifice for the cost model
            visited = rv[i] > 0
            best_u = float(child_u[i][visited].max()) if visited.any() else 0.0
            for a in order:
                if added >= top_k or rv[i][a] <= 0:
                    break
                if int(a) in node.edges:  # widening pass: keep, refresh visits
                    ckey, pr, v0 = node.edges[int(a)]
                    node.edges[int(a)] = (ckey, pr, max(v0, int(rv[i][a])))
                    continue
                # low-prior moves still enter the book if the search actually
                # spent visits on them
                if priors[i][a] < min_prior and rv[i][a] < 2 and (added > 0 or had_edges):
                    continue
                child_state = step1(st, jnp.asarray(int(a), jnp.int32))
                child_prob = node.path_prob * max(float(priors[i][a]), 1e-3)
                child_cost = node.wl_cost + max(best_u - float(child_u[i][a]), 0.0)
                ckey = self._add_state(child_state, child_prob, child_cost)
                child = self.nodes[ckey]
                if bool(child_state.done):
                    child.expanded = True  # terminal: nothing to expand
                    child.unexpanded_mass = 0.0
                    child.winloss = -1.0 if int(child_state.winner) else 0.0
                elif not child.expanded and child.visits == 0:
                    # seed with the parent search's estimate of this child
                    # (thisValuesNotInBook role) until its own search runs
                    child.winloss = -float(child_wl[i][a])  # child-mover persp.
                node.edges[int(a)] = (ckey, float(priors[i][a]), int(rv[i][a]))
                added += 1
            # remaining policy mass not in the book (widening priority);
            # a pass that adds nothing retires the node from the frontier
            mass = 1.0 - sum(pr for _, pr, _ in node.edges.values())
            node.unexpanded_mass = max(0.0, mass) if (added or not had_edges) else 0.0

    # ------------------------------------------------------------------

    def recompute(self):
        """Recursive book values (recomputeEverything → recomputeNodeValues,
        book.cpp:941-955,1277-1380): negamax each node's winloss over its
        expanded children's book values, floored by the node's own search
        value (an unexpanded move may be better than every edge — the
        reference's thisValuesNotInBook floor). Every Coffee move adds a
        stone, so num_turns strictly increases along edges and descending
        num_turns is a valid reverse-topological order over the DAG. Also
        accumulates recursive subtree visits (recursiveValues.visits;
        shared transpositions double-count, as in the reference)."""
        for n in sorted(self.nodes.values(), key=lambda m: -m.num_turns):
            best = None
            rec = n.visits
            for ckey, _, _ in n.edges.values():
                child = self.nodes[ckey]
                cv = -(child.book_wl if child.book_wl is not None else child.winloss)
                best = cv if best is None else max(best, cv)
                rec += child.rec_visits
            n.book_wl = n.winloss if best is None else max(n.winloss, best)
            n.rec_visits = rec

    def best_line(self, max_len: int = 10) -> list[tuple[str, int]]:
        """Greedy most-visited line from the root: [(node key, action)]."""
        out = []
        key = self.root_key
        seen = set()
        for _ in range(max_len):
            node = self.nodes[key]
            if not node.edges or key in seen:
                break
            seen.add(key)
            a = max(node.edges, key=lambda a: node.edges[a][2])
            out.append((key, a))
            key = node.edges[a][0]
        return out

    def check(self) -> list[str]:
        """Consistency check (the reference's checkbook): every edge target
        exists; winloss in range; root reachable sizes."""
        errors = []
        for k, node in self.nodes.items():
            for a, (ckey, prior, visits) in node.edges.items():
                if ckey not in self.nodes:
                    errors.append(f"{k}: edge {a} -> missing node {ckey}")
                if not (0 <= a < self.cfg.policy_size):
                    errors.append(f"{k}: bad action {a}")
            if not (-1.0001 <= node.winloss <= 1.0001):
                errors.append(f"{k}: winloss out of range {node.winloss}")
            if node.book_wl is not None:
                # recursive value must dominate the negamax of the children
                for a, (ckey, _, _) in node.edges.items():
                    child = self.nodes.get(ckey)
                    if child is not None and child.book_wl is not None:
                        if node.book_wl < -child.book_wl - 1e-6:
                            errors.append(
                                f"{k}: book_wl {node.book_wl:.4f} < negamax of"
                                f" edge {a} ({-child.book_wl:.4f})"
                            )
        if self.root_key not in self.nodes:
            errors.append("missing root")
        return errors

    # ------------------------------------------------------------------

    def save(self, path: str):
        data = {
            "version": 1,
            "game": "coffee",
            "x_size": self.cfg.x_size,
            "y_size": self.cfg.y_size,
            "win_len": self.cfg.win_len,
            "root": self.root_key,
            "nodes": {
                k: {
                    **{f: getattr(n, f) for f in (
                        "board", "to_move", "last_spot", "last_dir", "num_turns",
                        "winloss", "draw", "visits", "path_prob", "wl_cost",
                        "expanded", "unexpanded_mass", "book_wl", "rec_visits",
                    )},
                    "edges": {str(a): list(e) for a, e in n.edges.items()},
                }
                for k, n in self.nodes.items()
            },
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "Book":
        with open(path) as f:
            data = json.load(f)
        cfg = GameConfig(data["x_size"], data["y_size"], data["win_len"])
        book = Book(cfg)
        book.nodes = {}
        for k, nd in data["nodes"].items():
            node = BookNode(
                key=k,
                board=nd["board"],
                to_move=nd["to_move"],
                last_spot=nd["last_spot"],
                last_dir=nd["last_dir"],
                num_turns=nd["num_turns"],
                winloss=nd["winloss"],
                draw=nd["draw"],
                visits=nd["visits"],
                path_prob=nd["path_prob"],
                wl_cost=nd.get("wl_cost", 0.0),
                expanded=nd["expanded"],
                unexpanded_mass=nd.get("unexpanded_mass", 0.0 if nd["expanded"] else 1.0),
                book_wl=nd.get("book_wl"),
                rec_visits=nd.get("rec_visits", 0),
                edges={int(a): tuple(e) for a, e in nd["edges"].items()},
            )
            book.nodes[k] = node
        book.root_key = data["root"]
        return book

    # ------------------------------------------------------------------

    def _board_svg(self, n, last: tuple | None = None) -> str:
        """Static SVG board (bookcssjs.cpp's rendered-board role): grid,
        stones, and an optional last-move marker with its direction arrow."""
        cfg = self.cfg
        CELL = 36
        w, h = cfg.x_size * CELL, cfg.y_size * CELL
        parts = [
            f'<svg class="board" viewBox="0 0 {w} {h}" width="{w}" height="{h}">',
            f'<rect width="{w}" height="{h}" fill="#e8c98a"/>',
        ]
        for x in range(cfg.x_size):
            parts.append(
                f'<line x1="{x*CELL+CELL//2}" y1="{CELL//2}" x2="{x*CELL+CELL//2}" '
                f'y2="{h-CELL//2}" stroke="#7a5c2e"/>'
            )
        for y in range(cfg.y_size):
            parts.append(
                f'<line x1="{CELL//2}" y1="{y*CELL+CELL//2}" x2="{w-CELL//2}" '
                f'y2="{y*CELL+CELL//2}" stroke="#7a5c2e"/>'
            )
        for y in range(cfg.y_size):
            for x in range(cfg.x_size):
                c = n.board[y][x]
                if c == 0:
                    continue
                fill = "#111" if c == 1 else "#fafafa"
                parts.append(
                    f'<circle cx="{x*CELL+CELL//2}" cy="{y*CELL+CELL//2}" '
                    f'r="{CELL//2-3}" fill="{fill}" stroke="#444"/>'
                )
        if last is not None:
            lx, ly, ld = last
            cx, cy = lx * CELL + CELL // 2, ly * CELL + CELL // 2
            parts.append(
                f'<circle cx="{cx}" cy="{cy}" r="{CELL//5}" fill="none" '
                'stroke="#d03020" stroke-width="2"/>'
            )
            # direction ray: N (col), W (row), NW, NE — the move's line claim
            dx, dy = {0: (0, -1), 1: (-1, 0), 2: (-1, -1), 3: (1, -1)}[ld]
            parts.append(
                f'<line x1="{cx}" y1="{cy}" x2="{cx+dx*CELL//2}" '
                f'y2="{cy+dy*CELL//2}" stroke="#d03020" stroke-width="2"/>'
            )
        parts.append("</svg>")
        return "".join(parts)

    def _pv(self, n, keys: set, max_len: int = 8) -> list:
        """Best-line walk through book edges by visits (bookcssjs's PV
        display role). Returns [(move string, node key or None), ...]."""
        out = []
        cur = n
        seen = {n.key}
        for _ in range(max_len):
            if not cur.edges:
                break
            a, (ckey, _, _) = max(cur.edges.items(), key=lambda kv: kv[1][2])
            out.append((gio.action_to_string(a, self.cfg), ckey if ckey in keys else None))
            if ckey not in keys or ckey in seen:
                break
            seen.add(ckey)
            cur = self.nodes[ckey]
        return out

    def export_html(self, out_dir: str, max_nodes: int = 2000):
        """Static HTML browser — the writebook / bookcssjs.cpp role
        (`/root/reference/cpp/book/bookcssjs.cpp` renders navigable board
        pages with per-move values): one page per node with an SVG board
        (last-move marker + direction ray), per-move child BOOK values /
        priors / visits with links, the principal variation, parent-position
        links, and a depth-sorted index. Pure static output (no server);
        a small inline script gives table sorting like the reference's JS."""
        os.makedirs(out_dir, exist_ok=True)
        cfg = self.cfg
        nodes = sorted(self.nodes.values(), key=lambda n: -n.path_prob)[:max_nodes]
        keys = {n.key for n in nodes}
        parents: dict = {}
        for n in nodes:
            for a, (ckey, _, _) in n.edges.items():
                if ckey in keys:
                    parents.setdefault(ckey, []).append((n.key, a))
        css = (
            "body{font-family:sans-serif;margin:2em;max-width:60em}"
            "svg.board{margin:0.5em 0}"
            "table.m{border-collapse:collapse;margin-top:1em}"
            "table.m td,table.m th{border:1px solid #ccc;padding:4px 10px;"
            "text-align:right}"
            "table.m td:first-child{text-align:left}"
            "th{cursor:pointer;background:#f4f4f4}"
            ".pv{color:#555}.nav{margin-top:1em}"
            ".good{color:#0a7a0a}.bad{color:#c02020}"
        )
        sort_js = (
            "function srt(t,c){const b=t.tBodies[0];const r=[...b.rows];"
            "const d=t.dataset['s'+c]!=='1';t.dataset['s'+c]=d?'1':'0';"
            "r.sort((x,y)=>{const a=parseFloat(x.cells[c].dataset.v||x.cells[c].textContent)||0,"
            "e=parseFloat(y.cells[c].dataset.v||y.cells[c].textContent)||0;"
            "return d?e-a:a-e});r.forEach(w=>b.appendChild(w));}"
        )
        with open(os.path.join(out_dir, "style.css"), "w") as f:
            f.write(css)
        for n in nodes:
            moves = []
            for a, (ckey, prior, visits) in sorted(
                n.edges.items(), key=lambda kv: -kv[1][2]
            ):
                mv = gio.action_to_string(a, cfg)
                link = f'<a href="{ckey}.html">{mv}</a>' if ckey in keys else mv
                child = self.nodes.get(ckey)
                if child is not None:
                    cwl = child.book_wl if child.book_wl is not None else child.winloss
                    # negate: child values are child-mover perspective
                    wl_here = -cwl
                    cls = "good" if wl_here > 0.05 else ("bad" if wl_here < -0.05 else "")
                    wl_cell = f'<td class="{cls}" data-v="{wl_here:.4f}">{wl_here:+.3f}</td>'
                    draw_cell = f"<td>{child.draw:.3f}</td>"
                else:
                    wl_cell = '<td data-v="0">—</td>'
                    draw_cell = "<td>—</td>"
                moves.append(
                    f"<tr><td>{link}</td>{wl_cell}{draw_cell}"
                    f"<td>{prior:.3f}</td><td>{visits}</td></tr>"
                )
            mover = "black (●)" if n.to_move == 1 else "white (○)"
            pv = self._pv(n, keys)
            pv_html = " ".join(
                f'<a href="{k}.html">{mv}</a>' if k else mv for mv, k in pv
            )
            up = parents.get(n.key, [])
            up_html = " · ".join(
                f'<a href="{pk}.html">&larr; {gio.action_to_string(a, cfg)}</a>'
                for pk, a in up[:6]
            )
            html = (
                "<!DOCTYPE html><html><head>"
                '<link rel="stylesheet" href="style.css">'
                f"<script>{sort_js}</script>"
                "<title>KataCoffee book</title></head><body>"
                f"<h2>Position {n.key[:12]}</h2>"
                + self._board_svg(n)
                + f"<p>to move: {mover} · winloss {n.winloss:+.3f}"
                + (f" · book {n.book_wl:+.3f}" if n.book_wl is not None else "")
                + f" · draw {n.draw:.3f} "
                f"· visits {n.visits} · reach-prob {n.path_prob:.4f}</p>"
                + (f'<p class="pv">PV: {pv_html}</p>' if pv else "")
                + '<table class="m" id="mt"><thead><tr>'
                + "".join(
                    f'<th onclick="srt(document.getElementById(\'mt\'),{i})">{h}</th>'
                    for i, h in enumerate(
                        ("move", "winloss", "draw", "prior", "visits")
                    )
                )
                + "</tr></thead><tbody>"
                + "".join(moves)
                + "</tbody></table>"
                + '<p class="nav">'
                + (up_html + " · " if up_html else "")
                + f'<a href="{self.root_key}.html">root</a> · '
                + '<a href="list.html">all positions</a></p>'
                + "</body></html>"
            )
            with open(os.path.join(out_dir, f"{n.key}.html"), "w") as f:
                f.write(html)
        # depth/probability-sorted index of every exported position
        rows = "".join(
            f'<tr><td><a href="{n.key}.html">{n.key[:12]}</a></td>'
            f"<td>{int(np.sum(np.asarray(n.board) != 0))}</td>"
            f"<td>{'●' if n.to_move == 1 else '○'}</td>"
            f"<td>{(n.book_wl if n.book_wl is not None else n.winloss):+.3f}</td>"
            f"<td>{n.path_prob:.4f}</td><td>{n.visits}</td></tr>"
            for n in nodes
        )
        with open(os.path.join(out_dir, "list.html"), "w") as f:
            f.write(
                "<!DOCTYPE html><html><head>"
                '<link rel="stylesheet" href="style.css"></head><body>'
                "<h2>Book positions</h2>"
                '<table class="m"><thead><tr><th>key</th><th>stones</th>'
                "<th>to move</th><th>winloss(mover)</th><th>reach-prob</th>"
                "<th>visits</th>"
                "</tr></thead><tbody>" + rows + "</tbody></table></body></html>"
            )
        with open(os.path.join(out_dir, "index.html"), "w") as f:
            f.write(
                f'<!DOCTYPE html><html><head><meta http-equiv="refresh" '
                f'content="0; url={self.root_key}.html"></head></html>'
            )


def build_book(
    cfg: GameConfig,
    sp: SearchParams,
    eval_fn,
    num_rounds: int,
    batch_size: int,
    num_visits: int,
    seed: int = 0,
    log=print,
) -> Book:
    book = Book(cfg)
    key = jax.random.PRNGKey(seed)
    for r in range(num_rounds):
        frontier = book.frontier(batch_size)
        if not frontier:
            break
        key, k = jax.random.split(key)
        book.expand(frontier, sp, eval_fn, num_visits, k)
        log(f"book: round {r}: expanded {len(frontier)}, total nodes {len(book.nodes)}")
    book.recompute()
    return book
