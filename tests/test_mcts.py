"""Batched MCTS tests: invariants, scalar PUCT cross-check (the role of the
reference's runsearchtests golden traces), tactical sanity, and the
north-star batched uniform-prior config."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.game.board import legal_mask_flat, step
from katacoffee_tpu.search import (
    SearchParams,
    init_tree,
    root_values,
    root_visit_counts,
    run_search,
    select_moves,
    uniform_eval_fn,
)

CFG = GameConfig(5, 5, 4)


def batched_roots(cfg, n, moves=()):
    s = init_state(cfg)
    for a in moves:
        s = step(cfg, s, jnp.asarray(a, jnp.int32))
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


@functools.lru_cache(maxsize=None)
def searcher(sp: SearchParams, num_sims: int, cfg=CFG):
    ev = uniform_eval_fn(cfg)
    return jax.jit(
        lambda roots, rng: run_search(cfg, sp, ev, roots, num_sims, rng)
    )


class ScalarMCTS:
    """Independent scalar implementation of the same PUCT/backup math
    (float32), used to pin the batched implementation move-for-move."""

    def __init__(self, cfg, sp, root_state):
        self.cfg, self.sp = cfg, sp
        self.nodes = []
        self.root_state = root_state

    def _legal(self, state):
        return np.asarray(legal_mask_flat(self.cfg, state))

    def _new_node(self, state, parent):
        legal = self._legal(state)
        n = max(legal.sum(), 1)
        prior = np.where(legal, np.float32(1.0) / np.float32(n), np.float32(-1.0))
        term = bool(state.done)
        u = np.float32(0.0 if not term else (0.0 if int(state.winner) == 0 else -1.0))
        node = dict(
            state=state, prior=prior, children={}, parent=parent,
            w=np.float32(1.0), u=u, usq=u * u, self_u=u, term=term, visits=1,
        )
        self.nodes.append(node)
        return len(self.nodes) - 1

    def run(self, num_sims):
        sp = self.sp
        self._new_node(self.root_state, -1)
        for _ in range(num_sims):
            # descend
            path = [0]
            action = None
            while True:
                nd = self.nodes[path[-1]]
                if nd["term"]:
                    action = None
                    break
                prior = nd["prior"]
                A = prior.shape[0]
                child_w = np.zeros(A, np.float32)
                child_q = np.zeros(A, np.float32)
                has = np.zeros(A, bool)
                for a, ci in nd["children"].items():
                    c = self.nodes[ci]
                    child_w[a] = c["w"]
                    child_q[a] = -c["u"]
                    has[a] = True
                W = np.float32(child_w.sum())
                cpuct = np.float32(
                    sp.cpuctExploration
                    + sp.cpuctExplorationLog
                    * np.log((W + sp.cpuctExplorationBase) / sp.cpuctExplorationBase)
                )
                scaling = cpuct * np.sqrt(W + np.float32(0.01))
                mass = np.float32(np.where(has, np.maximum(prior, 0), 0).sum())
                is_root = len(path) == 1
                red = sp.rootFpuReductionMax if is_root else sp.fpuReductionMax
                parent_u = nd["u"]
                if sp.fpuParentWeightByVisitedPolicy:
                    # searchexplorehelpers.cpp:281-284
                    avg_w = np.float32(
                        min(1.0, mass ** sp.fpuParentWeightByVisitedPolicyPow)
                    )
                    parent_u = avg_w * parent_u + (np.float32(1.0) - avg_w) * nd["self_u"]
                fpu = parent_u - np.float32(red) * np.sqrt(mass)
                q = np.where(has, child_q, fpu)
                sel = scaling * np.maximum(prior, 0) / (1.0 + child_w) + q
                sel = np.where(prior < 0, -np.inf, sel)
                a = int(np.argmax(sel))
                if a in nd["children"]:
                    path.append(nd["children"][a])
                else:
                    action = a
                    break
            leaf_i = path[-1]
            leaf = self.nodes[leaf_i]
            if leaf["term"]:
                # revisit: incremental add of stored value
                old_w = leaf["w"]
                leaf["w"] = old_w + 1
                leaf["u"] = (leaf["u"] * old_w + leaf["self_u"]) / leaf["w"]
                leaf["visits"] += 1
                recompute_from = len(path) - 2
            else:
                new_state = step(self.cfg, leaf["state"], jnp.asarray(action, jnp.int32))
                ci = self._new_node(new_state, leaf_i)
                leaf["children"][action] = ci
                recompute_from = len(path) - 1
            for i in range(recompute_from, -1, -1):
                self._recompute(path[i])

    def _recompute(self, ni):
        nd = self.nodes[ni]
        cw = np.float32(0)
        cu_sum = np.float32(0)
        for a, ci in nd["children"].items():
            c = self.nodes[ci]
            cw += c["w"]
            cu_sum += c["w"] * np.float32(-c["u"])
        w = cw + 1.0  # self weight 1
        nd["u"] = (cu_sum + nd["self_u"]) / w
        nd["w"] = w
        nd["visits"] += 1

    def root_visits(self):
        A = self.nodes[0]["prior"].shape[0]
        out = np.zeros(A, np.int64)
        for a, ci in self.nodes[0]["children"].items():
            out[a] = self.nodes[ci]["visits"]
        return out


SIMPLE = SearchParams(valueWeightExponent=0.0)


class TestInvariants:
    def test_visit_conservation_and_values(self):
        sp = SIMPLE
        num_sims = 50
        roots = batched_roots(CFG, 8)
        tree = searcher(sp, num_sims)(roots, jax.random.PRNGKey(0))
        rv = np.asarray(root_visit_counts(tree))
        root_visits = np.asarray(tree.visits[:, 0])
        np.testing.assert_array_equal(root_visits, 1 + num_sims)
        # children visits account for all playouts that left the root
        np.testing.assert_array_equal(rv.sum(-1), num_sims)
        vals = root_values(tree)
        assert np.all(np.abs(np.asarray(vals["root_utility"])) <= 1.0 + 1e-5)
        # identical games, same seed -> identical trees across batch
        assert (rv == rv[0]).all()

    def test_terminal_root_no_crash(self):
        # play a full random game, then search from the done state
        import random

        from tests.oracle import OracleGame

        rnd = random.Random(3)
        g = OracleGame()
        moves = []
        while not g.done:
            x, y, d = rnd.choice(g.legal_moves())
            g.play(x, y, d)
            moves.append(d * 25 + y * 5 + x)
        roots = batched_roots(CFG, 4, moves)
        tree = searcher(SIMPLE, 10)(roots, jax.random.PRNGKey(1))
        assert np.asarray(tree.node_count).max() == 1  # nothing expanded
        assert np.asarray(tree.visits[:, 0]).min() == 11


class TestScalarParity:
    @pytest.mark.parametrize("moves", [(), (2 * 25 + 12,), (12, 1 * 25 + 10)])
    def test_visit_counts_match_scalar(self, moves):
        sp = SIMPLE
        num_sims = 60
        roots = batched_roots(CFG, 2, moves)
        tree = searcher(sp, num_sims)(roots, jax.random.PRNGKey(0))
        rv = np.asarray(root_visit_counts(tree))[0]

        s = init_state(CFG)
        for a in moves:
            s = step(CFG, s, jnp.asarray(a, jnp.int32))
        oracle = ScalarMCTS(CFG, sp, s)
        oracle.run(num_sims)
        np.testing.assert_array_equal(rv, oracle.root_visits())

    @pytest.mark.parametrize("pow_", [1.0, 2.0])
    def test_fpu_parent_weight_by_visited_policy(self, pow_):
        """fpuParentWeightByVisitedPolicy blends the FPU parent utility
        toward the raw NN utility by unvisited policy mass
        (searchexplorehelpers.cpp:281-284); on at every reference op point
        (selfplay1.cfg:184, setup.cpp:489)."""
        sp = dataclasses.replace(
            SIMPLE,
            fpuParentWeightByVisitedPolicy=True,
            fpuParentWeightByVisitedPolicyPow=pow_,
            fpuReductionMax=0.2,
            rootFpuReductionMax=0.1,
        )
        num_sims = 60
        moves = (12, 1 * 25 + 10)
        roots = batched_roots(CFG, 2, moves)
        tree = searcher(sp, num_sims)(roots, jax.random.PRNGKey(0))
        rv = np.asarray(root_visit_counts(tree))[0]

        s = init_state(CFG)
        for a in moves:
            s = step(CFG, s, jnp.asarray(a, jnp.int32))
        oracle = ScalarMCTS(CFG, sp, s)
        oracle.run(num_sims)
        np.testing.assert_array_equal(rv, oracle.root_visits())


class TestTactics:
    def test_finds_immediate_win(self):
        """Construct a position where the mover completes 4-in-a-row; the
        winning move must dominate visits even with a uniform prior."""
        import random

        from tests.oracle import OracleGame

        # find a position with a winning move via oracle search
        found = None
        for seed in range(200):
            rnd = random.Random(seed)
            g = OracleGame()
            moves = []
            while not g.done:
                lm = g.legal_moves()
                # check if any move wins immediately
                winmove = None
                for x, y, d in lm:
                    import copy

                    g2 = copy.deepcopy(g)
                    g2.play(x, y, d)
                    if g2.winner == g.to_move:
                        winmove = (x, y, d)
                        break
                if winmove and len(moves) >= 4:
                    found = (moves, winmove, g.to_move)
                    break
                x, y, d = rnd.choice(lm)
                g.play(x, y, d)
                moves.append((x, y, d))
            if found:
                break
        assert found is not None
        moves, (wx, wy, wd), mover = found
        flat_moves = [d * 25 + y * 5 + x for x, y, d in moves]
        win_action = wd * 25 + wy * 5 + wx
        roots = batched_roots(CFG, 2, flat_moves)
        tree = searcher(SIMPLE, 100)(roots, jax.random.PRNGKey(0))
        rv = np.asarray(root_visit_counts(tree))[0]
        assert rv.argmax() == win_action, (rv[win_action], rv.max())
        # and the root value should be clearly winning
        assert float(root_values(tree)["root_utility"][0]) > 0.5


def lcb_oracle_choice(tree, sp, game=0):
    """Scalar port of the reference's play-selection pipeline
    (searchresults.cpp:110-233: base child weights, goodness-best pick,
    getReducedPlaySelectionWeight over-visited reduction, LCB weight-blend
    under useNonBuggyLcb, then argmax at temp 0): independent loops over raw
    tree arrays, reference edge-scaling childWeight = weightSum *
    edgeVisits / childVisits (searchnode.h:59-64)."""
    import math

    children = np.asarray(tree.children[game, 0])
    evis = np.asarray(tree.edge_visits[game, 0]).astype(float)
    stats = np.asarray(tree.stats[game])
    prior = np.maximum(np.asarray(tree.root_prior[game]).astype(float), 0.0)
    A = children.shape[0]
    w = np.zeros(A)
    u = np.zeros(A)
    radius = np.zeros(A)
    lcb = np.full(A, -1e30)
    for i in range(A):
        c = children[i]
        if c < 0 or evis[i] <= 0:
            continue
        scale = evis[i] / max(stats[c, 0], 1.0)  # S_VISITS = 0
        w[i] = stats[c, 1] * scale  # S_W
        wsq = stats[c, 2] * scale * scale  # S_WSQ
        u[i] = -stats[c, 3]  # S_U, parent perspective
        usq = stats[c, 4]  # S_USQ
        var = max(usq - u[i] * u[i], 1e-8)
        ess = w[i] ** 2 / wsq if wsq > 0 else 1.0
        radius[i] = sp.lcbStdevs * math.sqrt(var / max(ess, 1.0))
        lcb[i] = u[i] - radius[i]

    # --- over-visited reduction (searchexplorehelpers.cpp:209-242) ---
    W = w.sum()
    cpuct = sp.cpuctExploration + sp.cpuctExplorationLog * math.log(
        (W + sp.cpuctExplorationBase) / sp.cpuctExplorationBase
    )
    if sp.cpuctUtilityStdevScale != 0.0:
        rw, ru, rusq = float(stats[0, 1]), float(stats[0, 3]), float(stats[0, 4])
        rusq = max(rusq, ru * ru)
        var_prior = sp.cpuctUtilityStdevPrior**2
        pw = sp.cpuctUtilityStdevPriorWeight
        if rw <= 1.0:
            stdev = sp.cpuctUtilityStdevPrior
        else:
            stdev = math.sqrt(max(0.0, ((ru * ru + var_prior) * pw + rusq * rw)
                                  / (pw + max(rw - 1.0, 1e-8)) - ru * ru))
        stdev_factor = 1.0 + sp.cpuctUtilityStdevScale * (stdev / sp.cpuctUtilityStdevPrior - 1.0)
    else:
        stdev_factor = 1.0
    scaling = cpuct * math.sqrt(W + 0.01) * stdev_factor
    goodness = [
        (w[i] * max(evis[i] - 1.0, 0.0) / max(evis[i], 1.0) + 2.0 * prior[i])
        if w[i] > 0 else -1e30
        for i in range(A)
    ]
    gbest = int(np.argmax(goodness))
    if w[gbest] > 0:
        best_sel = scaling * prior[gbest] / (1.0 + w[gbest]) + u[gbest]
        for i in range(A):
            if i == gbest or w[i] <= 0:
                continue
            denom = best_sel - u[i]
            wanted = 1e100 if denom <= 0 else max(
                scaling * prior[i] / max(denom, 1e-8) - 1.0, 0.0
            )
            w[i] = math.ceil(min(w[i], wanted))
    max_w = w.max()
    best_lcb, best_idx = -1e30, -1
    for i in range(A):
        if w[i] > 0 and w[i] >= sp.minVisitPropForLCB * max_w and lcb[i] > best_lcb:
            best_lcb, best_idx = lcb[i], i
    w_sel = w.copy()
    if sp.useLcbForSelection and best_idx >= 0:
        adjusted = w[best_idx]
        for i in range(A):
            if i == best_idx or w[i] <= 0:
                continue
            excess = best_lcb - lcb[i]
            if excess < 0:
                continue
            rf = (radius[i] + excess) / (radius[i] + 0.2 * excess)
            adjusted = max(adjusted, rf * rf * w[i])
        w_sel[best_idx] = adjusted
    return int(np.argmax(w_sel))


class TestLcbSelection:
    """The reference's LCB weight-blend on constructed cases (VERDICT weak
    #5): hand-edited child stats force each regime, and the batched
    select_moves must match the independent scalar oracle."""

    def _base_tree(self):
        sp = SIMPLE
        roots = batched_roots(CFG, 1)
        return searcher(sp, 60)(roots, jax.random.PRNGKey(3))

    def _set_child(self, tree, slot_action, visits, w, u, usq, wsq=None):
        """Overwrite the stats row of the root child at flat action."""
        c = int(np.asarray(tree.children[0, 0, slot_action]))
        assert c >= 0
        wsq = wsq if wsq is not None else (w * w / visits)
        row = np.asarray(tree.stats[0, c]).copy()
        row[0], row[1], row[2], row[3], row[4] = visits, w, wsq, -u, usq
        stats = np.asarray(tree.stats).copy()
        stats[0, c] = row
        ev = np.asarray(tree.edge_visits).copy()
        ev[0, 0, slot_action] = visits
        return tree._replace(
            stats=jnp.asarray(stats), edge_visits=jnp.asarray(ev)
        )

    def _choice(self, tree, sp):
        return int(
            np.asarray(
                select_moves(CFG, sp, tree, jax.random.PRNGKey(0))
            )[0]
        )

    def test_lcb_override_prefers_confident_runner_up(self):
        """Runner-up with better utility and tight radius must win the
        blend over a more-visited but worse child."""
        sp = dataclasses.replace(
            SIMPLE, useLcbForSelection=True, lcbStdevs=5.0,
            minVisitPropForLCB=0.15, chosenMoveTemperature=0.0,
            chosenMoveTemperatureEarly=0.0,
        )
        tree = self._base_tree()
        acts = [int(a) for a in np.argsort(-np.asarray(tree.edge_visits[0, 0]))[:2]]
        # most-visited: 40 visits, mean u 0.10, high variance
        tree = self._set_child(tree, acts[0], 40.0, 40.0, 0.10, 0.6)
        # runner-up: 20 visits (eligible), mean u 0.5, tiny variance
        tree = self._set_child(tree, acts[1], 20.0, 20.0, 0.5, 0.2501)
        got = self._choice(tree, sp)
        assert got == lcb_oracle_choice(tree, sp)
        assert got == acts[1]

    def test_ineligible_child_cannot_win(self):
        """A child below minVisitPropForLCB of the max weight is excluded
        from best-LCB no matter how good its LCB is."""
        sp = dataclasses.replace(
            SIMPLE, useLcbForSelection=True, lcbStdevs=5.0,
            minVisitPropForLCB=0.5, chosenMoveTemperature=0.0,
            chosenMoveTemperatureEarly=0.0,
        )
        tree = self._base_tree()
        acts = [int(a) for a in np.argsort(-np.asarray(tree.edge_visits[0, 0]))[:2]]
        tree = self._set_child(tree, acts[0], 40.0, 40.0, 0.10, 0.0101)
        # stellar but ineligible (20 < 0.5 * 40)
        tree = self._set_child(tree, acts[1], 19.0, 19.0, 0.9, 0.8101)
        got = self._choice(tree, sp)
        assert got == lcb_oracle_choice(tree, sp)
        assert got == acts[0]

    def test_oracle_match_on_searched_trees(self):
        """On real searched trees (no hand edits), the batched selection at
        temp 0 equals the scalar oracle for every game."""
        sp = dataclasses.replace(
            SIMPLE, useLcbForSelection=True, lcbStdevs=5.0,
            minVisitPropForLCB=0.15, chosenMoveTemperature=0.0,
            chosenMoveTemperatureEarly=0.0,
        )
        roots = batched_roots(CFG, 8)
        tree = searcher(sp, 80)(roots, jax.random.PRNGKey(11))
        sel = np.asarray(select_moves(CFG, sp, tree, jax.random.PRNGKey(0)))
        for g in range(8):
            assert sel[g] == lcb_oracle_choice(tree, sp, game=g), g


class TestMoveSelection:
    def test_zero_temperature_is_argmax_visits(self):
        sp = SIMPLE
        roots = batched_roots(CFG, 4)
        tree = searcher(sp, 40)(roots, jax.random.PRNGKey(0))
        rv = np.asarray(root_visit_counts(tree))
        sel = jax.jit(
            lambda t, k: select_moves(CFG, sp, t, k)
        )(tree, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(sel), rv.argmax(-1))

    def test_temperature_sampling_is_legal(self):
        sp = SearchParams(
            valueWeightExponent=0.0,
            chosenMoveTemperature=1.0,
            chosenMoveTemperatureEarly=1.0,
        )
        roots = batched_roots(CFG, 16)
        tree = searcher(sp, 30)(roots, jax.random.PRNGKey(0))
        legal = np.asarray(tree.prior[:, 0, :] >= 0)
        for k in range(3):
            sel = np.asarray(
                jax.jit(lambda t, kk: select_moves(CFG, sp, t, kk))(
                    tree, jax.random.PRNGKey(k)
                )
            )
            assert legal[np.arange(16), sel].all()


class TestNorthStarConfig2:
    def test_256_games_100_visits(self):
        """BASELINE.json config 2: batched uniform-prior MCTS, 256 parallel
        games, 100 visits/move, correct PUCT math (invariants + cross-batch
        determinism)."""
        sp = SIMPLE
        roots = batched_roots(CFG, 256)
        tree = searcher(sp, 100)(roots, jax.random.PRNGKey(0))
        rv = np.asarray(root_visit_counts(tree))
        np.testing.assert_array_equal(np.asarray(tree.visits[:, 0]), 101)
        np.testing.assert_array_equal(rv.sum(-1), 100)
        assert (rv == rv[0]).all()


from katacoffee_tpu.search import mcts  # noqa: E402  (depth-cap tests)


class TestPlayoutDepthCap:
    """maxPlayoutDepthProp (lockstep-specific soft truncation: capped
    playouts claim an edge visit via the catch-up bookkeeping)."""

    def test_capped_search_exact_visits_and_sane_tree(self):
        import dataclasses

        from katacoffee_tpu.game.board import init_state
        from katacoffee_tpu.search.mcts import S_VISITS, root_visit_counts

        sp = dataclasses.replace(
            SearchParams.for_selfplay(),
            rootNumSymmetriesToSample=1,
            maxPlayoutDepthProp=0.3,  # max_depth 8 on 5x5
        )
        B = 4
        roots = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_state(CFG)
        )
        tree = jax.jit(
            lambda r, k: mcts.run_search(CFG, sp, uniform_eval_fn(CFG), r, 150, k)
        )(roots, jax.random.PRNGKey(0))
        visits = np.asarray(tree.stats[:, 0, S_VISITS])
        np.testing.assert_allclose(visits, 151.0)
        # all structural invariants hold: children point at allocated slots,
        # no NaNs in live stats
        nc = np.asarray(tree.node_count)
        ch = np.asarray(tree.children)
        for b in range(B):
            live_ch = ch[b, : nc[b]]
            assert live_ch.max() < nc[b]
            assert np.isfinite(np.asarray(tree.stats[b, : nc[b]])).all()
        # root edge visits conserve the budget
        ev = np.asarray(root_visit_counts(tree)).sum(-1)
        np.testing.assert_allclose(ev, 150)

    def test_cap_matches_uncapped_at_low_visits(self):
        """At 40 visits trees rarely exceed depth 8, so a 0.3 cap should
        leave the chosen move distribution essentially unchanged."""
        import dataclasses

        from katacoffee_tpu.game.board import init_state
        from katacoffee_tpu.search.mcts import root_visit_counts

        B = 4
        roots = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_state(CFG)
        )
        outs = {}
        for prop in (1.0, 0.3):
            sp = dataclasses.replace(
                SearchParams(valueWeightExponent=0.0, useGraphSearch=True),
                maxPlayoutDepthProp=prop,
            )
            tree = jax.jit(
                lambda r, k, sp=sp: mcts.run_search(
                    CFG, sp, uniform_eval_fn(CFG), r, 40, k
                )
            )(roots, jax.random.PRNGKey(5))
            outs[prop] = np.asarray(root_visit_counts(tree))
        np.testing.assert_array_equal(outs[1.0], outs[0.3])
