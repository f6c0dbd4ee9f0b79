"""Divergence bound: the book's simplified frontier priority vs a
Coffee-reduced transcription of the reference's expansion cost model
(`/root/reference/cpp/book/book.cpp:1385-1840` recomputeNodeCost +
getNextNToExpand's ranking key minCostFromRoot + thisNodeExpansionCost,
params from cpp/configs/book/genbook7jp.cfg).

Our model (book.py _priority, documented simplification): priority =
path_prob x exp(-wl_cost / 0.15), expanded nodes re-enter at
x WIDEN_FACTOR x unexpanded policy mass. The reference compounds per-move
costs (UCB winloss losses at powers 1/3/7, -log policy, moves-expanded
penalties) plus half a dozen bonus terms. This test quantifies how far the
two RANKINGS diverge on synthetic game-shaped books:

  * Spearman rank correlation between our priority (descending) and the
    reference cost (ascending) over all expandable nodes;
  * top-5 frontier overlap (what genbook actually expands per pass).

Coffee reductions applied to the transcription (each a structural no-op
here, not an approximation): no score (score terms = 0, no sharpScore), no
pass moves (costWhenPassFavored never fires), no user bonuses /
visitsRequired, no re-expansion (maxVisitsForReExpansion unset in the
reference config too). Errors are synthesized as ~1/sqrt(visits), matching
the role of getAdjustedWinLossError.

The asserted bounds are a MEASURED property (see test output), documenting
the divergence of a deliberate design simplification (docs/DESIGN.md) —
not a parity claim.
"""

import math

import numpy as np
import pytest

# genbook7jp.cfg cost parameters (the reference's only shipped operating
# point for the cost model)
ERROR_FACTOR = 1.5
COST_PER_MOVE = 0.45
COST_UCB_WL = 4.50
COST_UCB_WL3 = 0.75
COST_UCB_WL7 = 0.75
COST_LOG_POLICY = 0.75
COST_MOVES_EXPANDED = 0.25
COST_SQ_MOVES_EXPANDED = 0.05
BONUS_WL_ERROR = 1.0
BONUS_EXCESS_UNEXPANDED = 2.0
BONUS_WLPV1 = 0.03
BONUS_WLPV2 = 0.15
BONUS_BIGGEST_WL_COST = 0.20
BONUS_UNEXPANDED_BEST_WL = 1.5
POLICY_BOOST_SCALE = 0.04
VISITS_SCALE = 1000.0


class Node:
    pass


def gen_book(seed: int, depth: int = 4, max_kids: int = 4):
    """Random game-shaped tree with negamax-correlated values and the fields
    BOTH cost models read, filled exactly the way Book.expand fills ours
    (path_prob product with 1e-3 floor, wl_cost best-sibling sacrifice)."""
    rng = np.random.default_rng(seed)
    nodes = []

    def mk(parent, pla_white, prior, depth_left, path_prob, wl_cost, wl_white):
        n = Node()
        n.idx = len(nodes)
        nodes.append(n)
        n.pla_white = pla_white
        n.parent = parent
        n.prior = prior
        n.path_prob = path_prob
        n.wl_cost = wl_cost
        n.wl = float(np.clip(wl_white, -0.98, 0.98))
        n.children = []
        level = 0 if parent is None else depth - depth_left
        n.visits = max(8.0, 12000.0 * (0.25 ** level))
        n.err = min(0.8, 1.0 / math.sqrt(n.visits))
        if depth_left > 0 and rng.random() < 0.9:
            k = int(rng.integers(2, max_kids + 1))
            pri = rng.dirichlet(np.full(k + 1, 0.7))  # +1 = unexpanded mass
            # children's white-perspective winloss: correlated to the node's
            # own value (negamax-ish: the best child ~= the node's value for
            # the mover) with per-move noise
            mover = 1.0 if pla_white else -1.0
            child_u = np.sort(
                mover * wl_white - np.abs(rng.normal(0.0, 0.25, size=k))
            )[::-1]
            child_u[0] = mover * wl_white - abs(rng.normal(0.0, 0.03))
            child_wl_white = np.clip(mover * child_u, -0.98, 0.98)
            best_u = float(child_u.max())
            order = np.argsort(-pri[:k])
            for rank, j in enumerate(order):
                c = mk(
                    n, not pla_white, float(pri[j]), depth_left - 1,
                    path_prob * max(float(pri[j]), 1e-3),
                    wl_cost + max(best_u - float(child_u[rank]), 0.0),
                    float(child_wl_white[rank]),
                )
                n.children.append(c)
            n.unexp_mass = float(pri[k])
        else:
            n.unexp_mass = 1.0
        n.nib_wl = float(np.clip(n.wl + rng.normal(0.0, 0.1), -0.99, 0.99))
        n.nib_max_policy = max(1e-3, n.unexp_mass * float(rng.uniform(0.3, 0.9)))
        return n

    root = mk(None, False, 1.0, depth, 1.0, 0.0,
              float(rng.normal(0.0, 0.2)))  # black to move at root
    return root, nodes


# ---------------------------------------------------------------------------
# Coffee-reduced transcription of Book::recomputeNodeCost (book.cpp:1385+)
# ---------------------------------------------------------------------------

def pow3(x):
    return x * x * x


def pow7(x):
    x3 = x * x * x
    return x3 * x3 * x


def ucb(n):
    return min(1.0, n.wl + ERROR_FACTOR * n.err)


def lcb(n):
    return max(-1.0, n.wl - ERROR_FACTOR * n.err)


def ref_costs(root, nodes):
    """Pre-order recomputeNodeCost; fills min_cost/exp_cost per node.
    White-perspective values throughout, like the reference."""
    for n in _preorder(root):
        white = n.pla_white
        if n.parent is None:
            n.min_cost = 0.0
            n.biggest_wl_cost = 0.0
        else:
            p = n.parent
            n.min_cost = p.move_costs[_child_index(p, n)]
            n.biggest_wl_cost = p.move_biggest[_child_index(p, n)]

        # winloss PV child (or the not-in-book expansion)
        best_wl = -1e100
        best_child = None
        for c in n.children:
            w = c.wl if white else -c.wl
            if w > best_wl:
                best_wl = w
                best_child = c
        n.move_is_wlpv = [c is best_child for c in n.children]
        nib_w = n.nib_wl if white else -n.nib_wl
        n.exp_is_wlpv = nib_w > best_wl

        def boost_log_policy(log_pol, child_utility, raw_pol):
            boosted = log_pol
            for oc in n.children:
                if oc.prior <= raw_pol:
                    continue
                other_u = oc.wl
                gain = (child_utility - other_u) if white else (other_u - child_utility)
                f = 1.0 / (1.0 + math.exp(-gain / POLICY_BOOST_SCALE + 1.0))
                p = log_pol + f * (math.log(oc.prior + 1e-100) - log_pol)
                if p > boosted:
                    boosted = p
                return boosted  # reference returns inside the loop (book.cpp)
            return log_pol

        smallest_ucb_cost = 1e100
        n.move_costs = []
        n.move_biggest = []
        for c in n.children:
            wl_loss = (ucb(n) - ucb(c)) if white else (lcb(c) - lcb(n))
            wl_loss3 = (pow3(ucb(n)) - pow3(ucb(c))) if white else (pow3(lcb(c)) - pow3(lcb(n)))
            wl_loss7 = (pow7(ucb(n)) - pow7(ucb(c))) if white else (pow7(lcb(c)) - pow7(lcb(n)))
            log_pol = math.log(c.prior + 1e-100)
            boosted = boost_log_policy(log_pol, c.wl, c.prior)
            cost_wl = wl_loss * COST_UCB_WL + wl_loss3 * COST_UCB_WL3 + wl_loss7 * COST_UCB_WL7
            if cost_wl > n.biggest_wl_cost:
                cost_wl -= BONUS_BIGGEST_WL_COST * (cost_wl - n.biggest_wl_cost)
            cost = n.min_cost + COST_PER_MOVE + cost_wl + (-boosted * COST_LOG_POLICY)
            n.move_costs.append(cost)
            n.move_biggest.append(max(n.biggest_wl_cost, cost_wl))
            smallest_ucb_cost = min(smallest_ucb_cost, cost_wl)

        # this-node expansion cost (always expandable here)
        wl_loss = (
            (ucb(n) - (n.nib_wl + ERROR_FACTOR * n.err))
            if white
            else ((n.nib_wl - ERROR_FACTOR * n.err) - lcb(n))
        )
        wl_loss3 = (
            (pow3(ucb(n)) - pow3(n.nib_wl + ERROR_FACTOR * n.err))
            if white
            else (pow3(n.nib_wl - ERROR_FACTOR * n.err) - pow3(lcb(n)))
        )
        wl_loss7 = (
            (pow7(ucb(n)) - pow7(n.nib_wl + ERROR_FACTOR * n.err))
            if white
            else (pow7(n.nib_wl - ERROR_FACTOR * n.err) - pow7(lcb(n)))
        )
        raw_pol = n.nib_max_policy
        log_pol = math.log(raw_pol + 1e-100)
        boosted = boost_log_policy(log_pol, n.nib_wl, raw_pol)
        moves_expanded = float(len(n.children))
        if moves_expanded > 1.0 / (raw_pol + 1e-30):
            moves_expanded = 1.0 / (raw_pol + 1e-30)
        cost_wl = wl_loss * COST_UCB_WL + wl_loss3 * COST_UCB_WL3 + wl_loss7 * COST_UCB_WL7
        if cost_wl > n.biggest_wl_cost:
            cost_wl -= BONUS_BIGGEST_WL_COST * (cost_wl - n.biggest_wl_cost)
        n.exp_cost = (
            COST_PER_MOVE
            + cost_wl
            + (-boosted * COST_LOG_POLICY)
            + moves_expanded * COST_MOVES_EXPANDED
            + moves_expanded * moves_expanded * COST_SQ_MOVES_EXPANDED
        )
        smallest_ucb_cost = min(smallest_ucb_cost, cost_wl)

        # replenish 0.8 x smallest UCB cost (cost conflict => interesting)
        if smallest_ucb_cost > 1e-100:
            n.move_costs = [c - 0.8 * smallest_ucb_cost for c in n.move_costs]
            n.exp_cost -= 0.8 * smallest_ucb_cost

        # winrate-beat clamp: a move clearly better than a cheaper sibling
        # moves 50% toward that sibling's cost
        new_costs = list(n.move_costs)
        for i, c in enumerate(n.children):
            w = c.wl if white else -c.wl
            best_other = n.move_costs[i]
            for j, oc in enumerate(n.children):
                if n.move_costs[j] < best_other:
                    wo = oc.wl if white else -oc.wl
                    if w > wo + 0.03:
                        best_other = n.move_costs[j]
            if best_other < n.move_costs[i]:
                new_costs[i] = n.move_costs[i] + 0.50 * (best_other - n.move_costs[i])
        n.move_costs = new_costs
        w = nib_w
        best_other = n.exp_cost + n.min_cost
        for j, oc in enumerate(n.children):
            if n.move_costs[j] < best_other:
                wo = oc.wl if white else -oc.wl
                if w > wo + 0.03:
                    best_other = n.move_costs[j]
        if best_other - n.min_cost < n.exp_cost:
            n.exp_cost += 0.50 * (best_other - n.min_cost - n.exp_cost)

        # winloss-error bonus per move (cap 0.75 of edge cost) + WLPV bonus
        for i, c in enumerate(n.children):
            bonus = BONUS_WL_ERROR * c.err
            cap = (n.move_costs[i] - n.min_cost) * 0.75
            n.move_costs[i] -= min(bonus, cap)
            if n.move_is_wlpv[i]:
                scale = n.move_costs[i] - n.min_cost
                if scale > 0.0:
                    f1 = max(0.0, 1.0 - c.wl * c.wl)
                    f2 = 4.0 * max(0.0, 0.25 - (0.5 - abs(c.wl)) ** 2)
                    n.move_costs[i] -= scale * math.tanh(f1 * BONUS_WLPV1 + f2 * BONUS_WLPV2)

        # expansion-cost bonuses: errors + excess unexpanded policy (cap
        # 0.75) + uncapped unexpanded-best-winloss
        moves_expanded = float(len(n.children))
        excess = 0.0
        if moves_expanded > 0 and n.nib_max_policy > 1.0 / moves_expanded:
            excess = n.nib_max_policy - 1.0 / moves_expanded
        bonus = BONUS_WL_ERROR * n.err + BONUS_EXCESS_UNEXPANDED * excess
        n.exp_cost -= min(bonus, n.exp_cost * 0.75)
        if n.children:
            best_other_wl = -1e100
            best_other_visits = 0.0
            total_other_visits = 0.0
            for c in n.children:
                wo = c.wl if white else -c.wl
                if wo > best_other_wl:
                    best_other_wl = wo
                    best_other_visits = c.visits
                total_other_visits += c.visits
            if nib_w > best_other_wl:
                vf = 0.5 * (
                    min(1.0, math.sqrt(best_other_visits / VISITS_SCALE))
                    + min(1.0, math.sqrt(total_other_visits / VISITS_SCALE))
                )
                n.exp_cost -= BONUS_UNEXPANDED_BEST_WL * (nib_w - best_other_wl) * vf
    return {n.idx: n.min_cost + n.exp_cost for n in nodes}


def _preorder(root):
    out, stack = [], [root]
    while stack:
        n = stack.pop()
        out.append(n)
        stack.extend(reversed(n.children))
    return out


def _child_index(parent, child):
    return parent.children.index(child)


# ---------------------------------------------------------------------------
# our priority, imported from the real Book class constants/logic
# ---------------------------------------------------------------------------

def our_priority(n):
    from katacoffee_tpu.book.book import Book

    p = n.path_prob * math.exp(-max(n.wl_cost, 0.0) / Book.COST_SCALE)
    if n.children:  # expanded → widening lane
        p *= Book.WIDEN_FACTOR * n.unexp_mass
    return p


def spearman(x, y):
    rx = np.argsort(np.argsort(x))
    ry = np.argsort(np.argsort(y))
    rx = rx - rx.mean()
    ry = ry - ry.mean()
    return float((rx * ry).sum() / math.sqrt((rx * rx).sum() * (ry * ry).sum()))


@pytest.mark.parametrize("widen_lane", [False, True])
def test_expansion_ranking_divergence_bound(widen_lane):
    """Measured bound on ranking divergence between our priority and the
    reference cost model over synthetic books. Separately for the fresh
    frontier (unexpanded nodes — what both models rank every pass) and the
    widening lane (expanded nodes with leftover policy mass)."""
    rhos, overlaps = [], []
    for seed in range(25):
        root, nodes = gen_book(seed)
        ref = ref_costs(root, nodes)
        pool = [
            n for n in nodes
            if (bool(n.children) == widen_lane)
            and (not widen_lane or n.unexp_mass > 0.05)
            and n.parent is not None
        ]
        if len(pool) < 5:
            continue
        ours = np.array([our_priority(n) for n in pool])
        refc = np.array([ref[n.idx] for n in pool])
        # our HIGH priority should track reference LOW cost
        rho = spearman(-ours, refc)
        rhos.append(rho)
        k = min(5, len(pool) // 2)
        top_ours = set(np.argsort(-ours)[:k].tolist())
        top_ref = set(np.argsort(refc)[:k].tolist())
        overlaps.append(len(top_ours & top_ref) / k)
    mean_rho = float(np.mean(rhos))
    mean_ov = float(np.mean(overlaps))
    print(
        f"\nwiden={widen_lane}: mean spearman {mean_rho:.3f} "
        f"(min {min(rhos):.3f}), top-k overlap {mean_ov:.2f} over {len(rhos)} books"
    )
    # Measured (25 synthetic books): fresh frontier mean rho 0.983
    # (min 0.941), overlap 0.85; widening lane mean rho 0.912 (min 0.810),
    # overlap 0.80 — the simplification preserves the reference's expansion
    # ORDER almost completely; bounds set with margin below the measurement.
    assert mean_rho > 0.85, (mean_rho, rhos)
    assert mean_ov > 0.60, (mean_ov, overlaps)


def test_ref_cost_sanity():
    """The transcription itself behaves like a cost model: root-adjacent
    high-policy near-PV lines are cheaper than deep refuted lines."""
    root, nodes = gen_book(123)
    ref = ref_costs(root, nodes)
    depth1 = [c for c in root.children]
    deep = [n for n in nodes if n.parent is not None and n.parent.parent is not None
            and n.parent.parent.parent is not None]
    if depth1 and deep:
        assert min(ref[n.idx] for n in depth1) < min(ref[n.idx] for n in deep)
