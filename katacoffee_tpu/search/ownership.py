"""Tree-averaged ownership maps (analysis/GTP protocol surface).

The reference averages each visited node's NN ownership map over the search
tree, weighting a node against its children by its own NN weight vs the
children's squared child-weights, with sublinear depth cutoffs
(`Search::getAverageTreeOwnership` / `traverseTreeForOwnership`,
reference cpp/search/searchresults.cpp:1566-1745). The reference must store
every node's ownership map in the tree for this (`alwaysIncludeOwnerMap`);
we instead RECOMPUTE the maps on demand with one batched forward pass over
the packed node-state arrays (`Tree.states` is [B, N, ...]) — a
store-vs-recompute inversion that keeps the search hot path free of the
[B, N, area] ownership buffer and is strictly cheaper on TPU (one extra
[N]-batch forward per analysis report vs an HBM write per simulation).

The proportion recursion itself runs on host numpy: it is a per-query
frontend computation over one game's small tree (N <= a few thousand), not
a hot path.

Perspective: per-node maps come out of the net in that node's mover
perspective; they are sign-aligned to the ROOT mover before averaging, so
the returned map is root-mover perspective (matching this package's
documented analysis/GTP ownership convention; the reference emits
white-perspective and flips at output, searchresults.cpp:1753-1760).
"""

from __future__ import annotations

import jax
import numpy as np


def node_ownership_maps(raw_forward, tree, i: int) -> np.ndarray:
    """[N, area] net ownership (tanh'd) for every node slot of game `i`,
    sign-aligned to the root mover. One batched forward over the node
    states; slots beyond node_count are garbage and must be masked by the
    caller's proportion vector (which is 0 there)."""
    states_i = jax.tree_util.tree_map(lambda x: x[i], tree.states)
    heads = raw_forward(states_i)
    own = np.tanh(np.asarray(heads["ownership"], np.float32))
    own = own.reshape(own.shape[0], -1)
    to_move = np.asarray(states_i.to_move)
    sign = np.where(to_move == to_move[0], 1.0, -1.0).astype(np.float32)
    return own * sign[:, None]


def ownership_props(
    children: np.ndarray,  # [N, A] int32 child index or -1
    edge_visits: np.ndarray,  # [N, A] int32
    visits: np.ndarray,  # [N] int
    weight_sum: np.ndarray,  # [N] f32
    self_weight: np.ndarray,  # [N] f32 node's own NN weight
    is_terminal: np.ndarray,  # [N] bool (no NN output -> not accumulated)
    node: int = 0,
) -> np.ndarray:
    """Per-node accumulation proportions for the subtree rooted at `node`
    (sums to 1 over accumulated nodes). Host re-design of the reference's
    traverseTreeForOwnership (searchresults.cpp:1616-1745): each node keeps
    desiredProp * selfNNWeight / (childrenWeightSum + selfNNWeight) for its
    own map and splits the rest over children proportionally to
    childWeight^2, stopping at desiredProp < minProp (sublinear in visits)
    and dropping branches below pruneProp; unaccumulated branches (terminal
    nodes, cycles back onto the path) return their proportion to the
    parent's own map."""
    n = children.shape[0]
    props = np.zeros(n, np.float64)
    min_prop = 0.5 / max(1.0, float(visits[node])) ** 0.75
    prune_prop = min_prop * 0.01
    path: set[int] = set()

    def traverse(nd: int, desired: float) -> bool:
        if is_terminal[nd]:
            return False
        if desired < min_prop:
            props[nd] += desired
            return True
        ch = children[nd]
        live = np.nonzero(ch >= 0)[0]
        if live.size == 0:
            props[nd] += desired
            return True
        if nd in path:
            # cycle in the graph: treat as base case (searchresults.cpp:1652)
            props[nd] += desired
            return True
        path.add(nd)
        cidx = ch[live]
        cw = weight_sum[cidx] * (
            edge_visits[nd, live] / np.maximum(visits[cidx], 1)
        ).astype(np.float64)
        rel_sum = float(np.sum(cw * cw))
        w_sum = float(np.sum(cw))
        parent_w = max(float(self_weight[nd]), 1e-10)
        from_children = desired * w_sum / (w_sum + parent_w)
        self_prop = desired * parent_w / (w_sum + parent_w)
        if from_children <= 0.0 or rel_sum <= 0.0:
            self_prop += from_children
        else:
            for k in range(live.size):
                d_child = float(cw[k]) * float(cw[k]) / rel_sum * from_children
                if d_child < prune_prop:
                    self_prop += d_child
                elif not traverse(int(cidx[k]), d_child):
                    self_prop += d_child
        path.discard(nd)
        props[nd] += self_prop
        return True

    traverse(int(node), 1.0)
    return props


def tree_ownership(
    tree,
    i: int,
    own_maps: np.ndarray,
    node: int = 0,
    want_stdev: bool = False,
) -> tuple[np.ndarray, np.ndarray | None]:
    """(average[area], stdev[area] or None) over the subtree of game `i`
    rooted at `node`, using precomputed per-node maps from
    node_ownership_maps. stdev is the proportion-weighted standard
    deviation across the search, searchresults.cpp:1587-1612."""
    children = np.asarray(tree.children[i])
    edge_visits = np.asarray(tree.edge_visits[i])
    visits = np.asarray(tree.visits[i])
    weight_sum = np.asarray(tree.weight_sum[i])
    self_weight = np.asarray(tree.self_weight[i])
    is_terminal = np.asarray(tree.is_terminal[i])
    props = ownership_props(
        children, edge_visits, visits, weight_sum, self_weight, is_terminal, node
    )
    total = props.sum()
    if total <= 0.0:
        # fully-terminal subtree: no NN maps anywhere — report zeros
        area = own_maps.shape[1]
        return np.zeros(area), (np.zeros(area) if want_stdev else None)
    props = props / total
    avg = props @ own_maps
    if not want_stdev:
        return avg, None
    sq = props @ (own_maps * own_maps)
    stdev = np.sqrt(np.maximum(sq - avg * avg, 0.0))
    return avg, stdev
