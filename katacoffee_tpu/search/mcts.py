"""Batched array-of-trees MCTS with KataGo search semantics, on-device.

This is the TPU re-design of the reference search stack
(`cpp/search/search.cpp`, `searchexplorehelpers.cpp`, `searchupdatehelpers.cpp`,
`searchhelpers.cpp`): one jitted program advances B independent searches in
lockstep — one simulation per game per round — so the NN forward always sees a
full [B, features] batch by construction. The reference's thread machinery
(virtual losses, spinlocks, CAS child insertion, batching server) has no
equivalent here because its job (keeping a GPU fed from CPU threads) does not
exist: parallelism is the batch axis (SURVEY.md §2.8 P1-P3).

TPU layout notes (profiled on real hardware):
  * Per-node statistics are PACKED into one [B, N, 8] array (`Tree.stats`):
    a node's children stats are fetched with a single one-hot einsum
    (`[B,A,N] @ [B,N,8]`) that the MXU executes in ~65µs — versus ~360µs for
    EACH [B,A]-indexed gather, of which the unpacked layout needed seven.
    Same for writes: one row scatter instead of seven. Convenience
    properties (.visits, .utility_avg, …) keep the external API unchanged.
  * Rules/feature line scans are precomputed incidence-matrix contractions
    (game/board.py _line_tables_np) so they also ride the MXU.
  * Backup loop bounds are dynamic in the batch's deepest leaf — typical
    depths are ~2-6, far below the worst-case board-area unroll.

KataGo semantics implemented (file:line cite → here):
  * PUCT selection: cpuct = c + c_log·log((W+base)/base); exploreScaling =
    cpuct·sqrt(W+0.01)·parentUtilityStdevFactor; selection = scaling·P/(1+w_c)
    + Q (searchexplorehelpers.cpp:9-45).
  * FPU: parent utility (optionally blended toward parent NN value) minus
    fpuReductionMax·sqrt(visited policy mass), loss-prop shift
    (searchexplorehelpers.cpp:262-300).
  * Graph search (useGraphSearch): node dedup by situation hash — in Coffee
    stones only accumulate, so the game graph is a DAG and the plain
    situation hash is a sound transposition key (no GraphHash path-class
    chain needed, game/graphhash.cpp:14-44 becomes game/board.py
    situation_hash). Transposed children are linked, not re-evaluated;
    per-edge visit counts are tracked separately from node visits; child
    weight in selection/aggregation scales by edgeVisits/childVisits
    (searchnode.h:59-64 childWeight); edge-visit catch-up claims an edge
    visit without descending when edge < child visits, with an optional
    leak-through probability (search.cpp:1169-1206 maybeCatchUpEdgeVisits).
  * Tree reuse between moves (advance_root): the reference's beginSearch
    reuse (search.cpp:262-331) as an array compaction; reused visits count
    toward the visit budget like the reference's maxVisits.
  * Value aggregation: each backup recomputes every path node's stats from
    its child edges with value-based downweighting — z-scored child utilities
    through a normal CDF raised to valueWeightExponent
    (searchupdatehelpers.cpp:330-417 downweightBadChildrenAndNormalizeWeight).
  * Noise pruning (useNoisePruning): children whose utility trails the
    weighted average of higher-policy children are capped near twice their
    raw-policy weight share (searchupdatehelpers.cpp pruneNoiseWeight).
    Deviation: the reference's scan is sequential in policy order, using
    already-pruned weights of earlier children; we vectorize with prefix sums
    over *unpruned* weights — identical unless an earlier sibling was itself
    pruned, a second-order effect. The policy ordering is computed once at
    node creation (Tree.policy_rank), not re-sorted per backup.
  * Subtree value bias (subtreeValueBiasFactor): per-game table keyed by
    (mover, previous move, move before that) accumulating
    (childrenUtility − nnUtility)·weight deltas differentially; a fraction of
    the entry average is added to each node's direct eval at every recompute
    (searchupdatehelpers.cpp:27-37,254-285, subtreevaluebiastable.h). The
    reference key also folds a local board pattern; on a 5×5 board the two
    previous moves already nearly determine the local pattern, so we key on
    (mover, prev, prev2) hashed into a fixed per-game table.
  * Uncertainty-weighted evals: weight = coeff/(err^exp + coeff/maxWeight)
    (searchupdatehelpers.cpp:98-121).
  * Root Dirichlet noise with KataGo's alpha allocation (half uniform, half
    shaped by excess log-policy; searchhelpers.cpp computeDirichletAlpha
    Distribution) and root policy temperature with early-game interpolation.
    Root priors live in a separate root_prior array; node priors stay raw, so
    a reused subtree node can become the root and get fresh noise.
  * Forced playouts at root: children with >0 visits are forced up to
    sqrt(coeff·P·totalVisits) visits (searchexplorehelpers.cpp:150).
  * Terminal handling: terminal nodes are re-visited, re-adding the exact
    game result (search.cpp:943-952 — without the GPU-pacing sleep, which is
    meaningless in lockstep).
  * LCB move selection + temperature (searchresults.cpp, see select_moves).

Not yet implemented (documented): pattern bonus (avoid-repetition utility
bonuses, patternbonustable.cpp — a Go-selfplay diversity device), anti-mirror
(Go-specific, dropped per SURVEY.md §2.3).

Perspective convention: node utilities are stored from the viewpoint of the
player to move AT THAT NODE (negamax). The reference stores white-perspective
and flips at use; negamax removes the flip bookkeeping.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import (
    GameConfig,
    GameState,
    legal_mask_flat,
    situation_hash,
    step,
)
from katacoffee_tpu.nn.features import extract_features
from katacoffee_tpu.search.params import SearchParams

# A tiny weight floor to avoid 0/0 in averages.
_EPS = 1e-8

# Subtree-value-bias table slots per game (hashed (mover, prev, prev2) keys;
# collisions blur the bias, which is a heuristic — acceptable and documented).
BIAS_SLOTS = 16384

# Channel layout of Tree.stats [B, N, NUM_STATS] (NodeStatsAtomic equivalent,
# searchnode.h:16-36, minus Go-only score fields).
S_VISITS, S_W, S_WSQ, S_U, S_USQ, S_WL, S_DRAW, S_PAD = range(8)
NUM_STATS = 8
# Channel layout of Tree.self_stats [B, N, 4] (the node's own NN/terminal
# evaluation; utility stored UN-biased — bias applies at use).
F_U, F_WL, F_DRAW, F_W = range(4)
NUM_SELF = 4


class Tree(NamedTuple):
    """Array-of-trees state. Leading dims: [B, N] (games × node slots)."""

    states: GameState  # pytree, leaves [B, N, ...]
    stats: jax.Array  # [B, N, 8] f32, S_* channels (negamax perspective)
    self_stats: jax.Array  # [B, N, 4] f32, F_* channels
    prior: jax.Array  # [B, N, A] f32 raw policy; illegal moves = -1
    root_prior: jax.Array  # [B, A] f32 root policy after temp/noise; -1 illegal
    children: jax.Array  # [B, N, A] int32 child index or -1
    edge_visits: jax.Array  # [B, N, A] int32 per-edge visit counts
    parent: jax.Array  # [B, N] int32 (first parent under transpositions)
    parent_action: jax.Array  # [B, N] int32
    is_terminal: jax.Array  # [B, N] bool
    node_count: jax.Array  # [B] int32
    sit_hash: jax.Array  # [B, N, 2] uint32 situation hash (transposition key)
    policy_rank: jax.Array  # [B, N, A] int32: each action's position in the
    #   node's policy-descending order ([B,1,1] dummy when noise pruning off)
    bias_key: jax.Array  # [B, N] int32
    last_bias_delta: jax.Array  # [B, N] f32 node's last table contribution
    last_bias_weight: jax.Array  # [B, N] f32
    bias_table: jax.Array  # [B, K, 2] f32 (deltaUtilitySum, weightSum)
    root_hint: jax.Array  # [B] int32 rootHintLoc action (-1 = none): gets a
    #   2% root policy share and forced selection until its weight reaches
    #   80% of the heaviest sibling's (search.h:81, searchhelpers.cpp:206-218,
    #   searchexplorehelpers.cpp:155-168). Lockstep deviation (documented in
    #   docs/DESIGN.md): the reference's 4x visit scaling on hint positions
    #   is NOT applied — a per-game visit budget gates the whole lockstep
    #   batch on its slowest game; the policy shift + forced selection are
    #   what guarantee the hint move gets explored.

    # -- unpacked views (convenience; do not use in per-sim hot code) --
    @property
    def visits(self) -> jax.Array:
        return (self.stats[..., S_VISITS] + 0.5).astype(jnp.int32)

    @property
    def weight_sum(self) -> jax.Array:
        return self.stats[..., S_W]

    @property
    def weight_sq_sum(self) -> jax.Array:
        return self.stats[..., S_WSQ]

    @property
    def utility_avg(self) -> jax.Array:
        return self.stats[..., S_U]

    @property
    def utility_sq_avg(self) -> jax.Array:
        return self.stats[..., S_USQ]

    @property
    def wl_avg(self) -> jax.Array:
        return self.stats[..., S_WL]

    @property
    def draw_avg(self) -> jax.Array:
        return self.stats[..., S_DRAW]

    @property
    def self_utility(self) -> jax.Array:
        return self.self_stats[..., F_U]

    @property
    def self_wl(self) -> jax.Array:
        return self.self_stats[..., F_WL]

    @property
    def self_draw(self) -> jax.Array:
        return self.self_stats[..., F_DRAW]

    @property
    def self_weight(self) -> jax.Array:
        return self.self_stats[..., F_W]


class EvalResult(NamedTuple):
    """What an evaluator returns for a batch of states (the NNOutput of the
    reference, nninputs.h:75-118, reduced to Coffee-relevant fields)."""

    policy: jax.Array  # [B, A] probabilities over legal moves (sum 1)
    utility: jax.Array  # [B] win-draw-loss utility, mover perspective
    wl: jax.Array  # [B] win-minus-loss probability
    draw: jax.Array  # [B] draw probability
    shortterm_error: jax.Array  # [B]
    # optimistic-policy-head probabilities ([B, A], sum 1) or None when the
    # evaluator has no such head; the search blends per policyOptimism /
    # rootPolicyOptimism (searchparams.h:30, setup.cpp:507-512,653-659)
    policy_opt: jax.Array | None = None


EvalFn = Callable[[GameState, jax.Array], EvalResult]  # (states[B], rng) -> ...


# ---------------------------------------------------------------------------
# Evaluators
# ---------------------------------------------------------------------------


def uniform_eval_fn(cfg: GameConfig) -> EvalFn:
    """debugSkipNeuralNet-equivalent (nneval.h:93): uniform prior over legal
    moves, zero value. Deterministic (the reference adds noise; we keep it
    exact for test pinning)."""

    def fn(states: GameState, rng: jax.Array) -> EvalResult:
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)
        cnt = jnp.maximum(legal.sum(-1, keepdims=True), 1)
        policy = legal.astype(jnp.float32) / cnt
        b = policy.shape[0]
        return EvalResult(
            policy=policy,
            utility=jnp.zeros((b,), jnp.float32),
            wl=jnp.zeros((b,), jnp.float32),
            draw=jnp.zeros((b,), jnp.float32),
            shortterm_error=jnp.full((b,), 0.5, jnp.float32),
        )

    return fn


def gaussian_prior_eval_fn(cfg: GameConfig) -> EvalFn:
    """EXACT mirror of the reference's randomized debugSkipNeuralNet
    (nneval.cpp:442-500): per eval, policy logits are standard gaussians at
    the dir-NORTH positions (the fork writes only pos = y*X+x, the first
    Y*X entries of the dir-major layout) and 0 for the other directions,
    softmaxed over legal moves; value is a 2-way softmax over two N(0,0.2)
    logits. Used by the cross-engine match harness so both engines search
    under the same knowledge-free prior distribution."""

    def fn(states: GameState, rng: jax.Array) -> EvalResult:
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)
        b, a = legal.shape
        k_pol, k_val = jax.random.split(rng)
        logits = jnp.zeros((b, a), jnp.float32)
        logits = logits.at[:, : cfg.area].set(
            jax.random.normal(k_pol, (b, cfg.area))
        )
        lg = jnp.where(legal, logits, -jnp.inf)
        policy = jnp.where(legal, jax.nn.softmax(lg, axis=-1), 0.0)
        vl = jax.random.normal(k_val, (b, 2)) * 0.2
        wl2 = jax.nn.softmax(vl, axis=-1)
        utility = wl2[:, 0] - wl2[:, 1]
        # shortterm pre-softplus is 0 (nneval.cpp:496) -> softplus(0)*0.5
        st = jnp.full((b,), 0.5 * math.log(2.0), jnp.float32)
        return EvalResult(
            policy=policy,
            utility=utility,
            wl=utility,
            draw=jnp.zeros((b,), jnp.float32),
            shortterm_error=st,
        )

    return fn


def make_raw_forward_fn(cfg: GameConfig, model, params):
    """Jitted full forward over a batch of GameStates, returning every model
    head (ownership, futurepos, line logits, …) — the analysis engine's
    includeOwnership / kata-raw-nn source. The search EvalFn deliberately
    drops the aux heads (computing them every eval would waste HBM
    bandwidth); this separate path serves the protocol surfaces."""

    def fn(states: GameState):
        spatial, glob = jax.vmap(functools.partial(extract_features, cfg))(states)
        return model.apply(params, spatial, glob)

    return jax.jit(fn)


class NNResultCache:
    """Serving-side NN result cache — the role of the reference's
    NNCacheTable (`cpp/neuralnet/nneval.h:18-42`, hash-keyed shared_ptr
    entries) for the protocol surfaces. The in-search path deliberately has
    no cache (transposition dedup re-uses evals in-graph; a host cache
    would force a device round-trip per leaf), but GTP / analysis re-query
    the same positions across requests (kata-raw-nn, includeOwnership
    recomputes, repeated analyze of a board) and each query is a full-head
    forward.

    Keyed EXACTLY (board bytes + to_move + full recent-move ring) rather
    than by zobrist hash: serving batches are tiny, so exactness is free and
    collision-proof where the reference needs 128-bit hashes. The recent
    ring (not just lastLoc) is part of the key because extract_features
    consumes recent_spots/recent_dirs[1..4] as input planes 7-10 — two
    queries with the same board+lastLoc but different earlier move order
    are different NN inputs. LRU via dict insertion order.
    Batch policy: all rows hit -> stacked cached result, zero device work;
    any miss -> forward the WHOLE batch once (keeps one compiled shape) and
    insert every row."""

    def __init__(self, forward, capacity: int = 4096):
        self._forward = forward
        self._capacity = capacity
        self._store: dict = {}
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _key(states: GameState, i: int) -> tuple:
        return (
            np.asarray(states.board[i]).tobytes(),
            int(states.to_move[i]),
            np.asarray(states.recent_spots[i]).tobytes(),
            np.asarray(states.recent_dirs[i]).tobytes(),
        )

    def __call__(self, states: GameState):
        b = int(states.board.shape[0])
        keys = [self._key(states, i) for i in range(b)]
        cached = [self._store.get(k) for k in keys]
        if all(c is not None for c in cached):
            self.hits += b
            for k in keys:  # refresh LRU order
                self._store[k] = self._store.pop(k)
            return {
                name: np.stack([c[name] for c in cached])
                for name in cached[0]
            }
        self.misses += b
        out = self._forward(states)
        out_np = {k: np.asarray(v) for k, v in out.items()}
        for i, k in enumerate(keys):
            self._store.pop(k, None)
            self._store[k] = {name: v[i] for name, v in out_np.items()}
        while len(self._store) > self._capacity:
            self._store.pop(next(iter(self._store)))
        return out_np


def make_cached_raw_forward_fn(cfg: GameConfig, model, params, capacity: int = 4096):
    """make_raw_forward_fn wrapped in an NNResultCache (the serving stack's
    default; cli.py wires this for gtp/analysis)."""
    return NNResultCache(make_raw_forward_fn(cfg, model, params), capacity)


def make_nn_eval_fn(
    cfg: GameConfig,
    model,
    params,
    policy_optimism: float = 0.0,
    symmetry_randomize: bool = False,
) -> EvalFn:
    """Wrap a CoffeeNet into an EvalFn: extract features, forward, mask+
    normalize policy over legal moves, reduce value head to utility.
    policyOptimism geometrically interpolates raw and optimistic policy
    (searchparams.h:30). symmetry_randomize applies a random dihedral
    symmetry per evaluation and inverts it on the policy — the reference
    NNEvaluator's nnRandomize (nneval.cpp random symmetry per eval), which
    decorrelates eval bias across the search."""

    def fn(states: GameState, rng: jax.Array) -> EvalResult:
        spatial, glob = jax.vmap(functools.partial(extract_features, cfg))(states)
        if symmetry_randomize:
            from katacoffee_tpu.game import symmetry as S

            B = spatial.shape[0]
            nsym = S.num_symmetries(cfg)
            syms = jax.random.randint(rng, (B,), 0, nsym)

            def fwd_row(sym, sp_r):
                return jax.lax.switch(
                    sym,
                    [lambda x, s=s: S.apply_features(s, x) for s in range(nsym)],
                    sp_r,
                )

            spatial = jax.vmap(fwd_row)(syms, spatial)
        out = model.apply(params, spatial, glob)
        logits = out["policy_logits"]
        if symmetry_randomize:
            from katacoffee_tpu.game import symmetry as S

            def inv_row(sym, pol):
                return jax.lax.switch(
                    sym,
                    [
                        lambda p, s=s: S.apply_policy(cfg, S.invert(s), p)
                        for s in range(nsym)
                    ],
                    pol,
                )

            logits = jax.vmap(inv_row)(syms, logits)
            out["optimistic_policy_logits"] = jax.vmap(inv_row)(
                syms, out["optimistic_policy_logits"]
            )
        if policy_optimism > 0.0:
            # eval-level blend (legacy knob); prefer leaving this 0 and
            # setting SearchParams.policyOptimism/rootPolicyOptimism, which
            # the search applies per node depth via EvalResult.policy_opt
            logits = (1.0 - policy_optimism) * logits + policy_optimism * out[
                "optimistic_policy_logits"
            ]
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)

        def masked_softmax(lg):
            lg = jnp.where(legal, lg, -jnp.inf)
            p = jax.nn.softmax(lg, axis=-1)
            return jnp.where(legal, p, 0.0)

        policy = masked_softmax(logits)
        policy_opt = masked_softmax(out["optimistic_policy_logits"])
        # value_logits: [win, loss, draw] of player to move
        probs = jax.nn.softmax(out["value_logits"], axis=-1)
        utility = probs[:, 0] - probs[:, 1]
        return EvalResult(
            policy=policy,
            utility=utility,
            wl=utility,
            draw=probs[:, 2],
            shortterm_error=out["shortterm_error"],
            policy_opt=policy_opt,
        )

    return fn


@jax.named_scope("ph_rooteval")
def _root_eval(
    cfg: GameConfig, sp: SearchParams, eval_fn: EvalFn, states: GameState, rng: jax.Array
) -> EvalResult:
    """Root evaluation, honoring rootNumSymmetriesToSample (searchparams.h:64,
    selfplay1.cfg:149 sets 4): sample that many DISTINCT dihedral symmetries
    per game, evaluate the transformed root under each, inverse-transform the
    policies, and average all outputs — decorrelating root NN bias where it
    matters most. Implemented at the state level (transform GameState, call
    eval_fn, undo the policy) so it composes with any evaluator, including
    nnRandomize-wrapped ones."""
    k = int(sp.rootNumSymmetriesToSample)
    if k <= 1:
        return eval_fn(states, rng)
    from katacoffee_tpu.game import symmetry as S

    nsym = S.num_symmetries(cfg)
    k = min(k, nsym)
    B = states.board.shape[0]
    k_pick, k_eval = jax.random.split(rng)
    # k distinct symmetries per game: random permutation prefix
    perm = jnp.argsort(jax.random.uniform(k_pick, (B, nsym)), axis=-1)

    def eval_under(j):
        sym = perm[:, j]

        def fwd_row(s_i, st):
            return jax.lax.switch(
                s_i, [lambda t, s=s: S.apply_state(cfg, s, t) for s in range(nsym)], st
            )

        ts = jax.vmap(fwd_row)(sym, states)
        res = eval_fn(ts, jax.random.fold_in(k_eval, j))

        def inv_row(s_i, pol):
            return jax.lax.switch(
                s_i,
                [lambda p, s=s: S.apply_policy(cfg, S.invert(s), p) for s in range(nsym)],
                pol,
            )

        res = res._replace(policy=jax.vmap(inv_row)(sym, res.policy))
        if res.policy_opt is not None:
            res = res._replace(policy_opt=jax.vmap(inv_row)(sym, res.policy_opt))
        return res

    acc = eval_under(0)
    for j in range(1, k):
        r = eval_under(j)
        acc = jax.tree_util.tree_map(lambda a, b: a + b, acc, r)
    return jax.tree_util.tree_map(lambda a: a / k, acc)


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def _blend_policy(res: EvalResult, optimism: float) -> jax.Array:
    """policyOptimism: geometric interpolation between the raw and
    optimistic policies (searchparams.h:30 — the reference blends the two
    heads' logits linearly before softmax, which equals this normalized
    geometric mean of the probabilities). Static no-op when the evaluator
    has no optimistic head or optimism is 0 (the defaults)."""
    if res.policy_opt is None or optimism == 0.0:
        return res.policy
    mask = res.policy > 0
    lp = jnp.log(jnp.maximum(res.policy, 1e-30))
    lo = jnp.log(jnp.maximum(res.policy_opt, 1e-30))
    b = jnp.where(mask, jnp.exp((1.0 - optimism) * lp + optimism * lo), 0.0)
    return b / jnp.maximum(b.sum(-1, keepdims=True), 1e-30)


def _eval_weight(sp: SearchParams, shortterm_error: jax.Array) -> jax.Array:
    """computeWeightFromNNOutput (searchupdatehelpers.cpp:103-121)."""
    if not sp.useUncertainty:
        return jnp.ones_like(shortterm_error)
    err = sp.winLossUtilityFactor * shortterm_error
    if sp.uncertaintyExponent != 1.0:
        err = jnp.power(jnp.maximum(err, 0.0), sp.uncertaintyExponent)
    baseline = sp.uncertaintyCoeff / sp.uncertaintyMaxWeight
    return sp.uncertaintyCoeff / (err + baseline)


def _terminal_utility(states: GameState) -> jax.Array:
    """Utility of a finished game from the perspective of the player to move
    (who did NOT make the final move): loss if there is a winner, 0 on draw.
    Reference: boardhistory.cpp:171-175 (mover wins) + decision 8 (draw=0)."""
    return jnp.where(states.winner == 0, 0.0, -1.0)


def _stats_row(visits, w, wsq, u, usq, wl, draw):
    return jnp.stack(
        [visits, w, wsq, u, usq, wl, draw, jnp.zeros_like(w)], axis=-1
    )


def _policy_ranks(raw_prior: jax.Array) -> jax.Array:
    """[B, A]: each action's position in the policy-descending order (0 =
    highest policy). Only the relative order matters — noise pruning's
    prefix sums are computed with a rank-comparison mask matmul, never by
    physically permuting arrays (a [B,A]-indexed take_along_axis serializes
    on TPU — profiled ~200µs per call at B=256)."""
    order = jnp.argsort(-jnp.maximum(raw_prior, 1e-30), axis=-1)
    return jnp.argsort(order, axis=-1).astype(jnp.int32)


def _bias_keys(cfg: GameConfig, states: GameState) -> jax.Array:
    """[B] int32 subtree-value-bias table slot from (mover of last move,
    last move, move before that) — the array analogue of
    SubtreeValueBiasTable::get (subtreevaluebiastable.h:29)."""
    area = cfg.area
    sentinel = 4 * area  # "no move"
    s0 = states.recent_spots[..., 0]
    d0 = states.recent_dirs[..., 0]
    a0 = jnp.where(s0 >= 0, jnp.minimum(d0, 3) * area + s0, sentinel)
    s1 = states.recent_spots[..., 1]
    d1 = states.recent_dirs[..., 1]
    a1 = jnp.where(s1 >= 0, jnp.minimum(d1, 3) * area + s1, sentinel)
    mover = (3 - states.to_move).astype(jnp.int32) - 1  # 0/1
    k = (a0 * (sentinel + 1) + a1) * 2 + mover
    k = (k.astype(jnp.uint32) * np.uint32(2654435761)) >> np.uint32(18)
    return (k % np.uint32(BIAS_SLOTS)).astype(jnp.int32)


def _bias_avg(sp: SearchParams, tree: Tree, bidx, key: jax.Array) -> jax.Array:
    """factor * entry average where the entry has weight (addLeafValue
    searchupdatehelpers.cpp:27-37)."""
    entry = tree.bias_table[bidx, key]  # [B, 2]
    return jnp.where(
        entry[:, 1] > 0.001,
        sp.subtreeValueBiasFactor * entry[:, 0] / jnp.maximum(entry[:, 1], 1e-9),
        0.0,
    )


# Effectively-infinite threshold = the einsum is ALWAYS used. An in-search
# A/B on the real chip (tools/pallas_gather_ab.py, round 3) measured the
# Pallas VMEM-tiled gather LOSING at every large-board selfplay shape it
# was built for — 10×10w5 B=256: 35.8k vs 40.5k visits/s; B=512 (79M
# one-hot elems/fetch): 30.2k vs 36.4k — the kernel re-DMAs the [tb, N, 8]
# table block per action-chunk program, which outweighs the einsum's
# one-hot HBM materialization at every reachable B·A·N. Tree results are
# bit-identical between the paths (the A/B's equivalence check), so this
# switch is kept as a tested escape hatch, not a perf lever.
_PALLAS_GATHER_MIN_ELEMS = 1 << 62


@jax.named_scope("ph_gather")
def _gather_child_stats(tree: Tree, bidx, node):
    """Raw stat rows of every child of `node`: [B, A, 8]. One one-hot einsum
    fetches all channels of all children at once (the profiled fast path —
    see module docstring and _PALLAS_GATHER_MIN_ELEMS for the measured
    kernel alternative). Missing children give zero rows."""
    N = tree.stats.shape[1]
    child = tree.children[bidx, node]  # [B, A]
    B, A = child.shape
    has = child >= 0
    cidx = jnp.maximum(child, 0)
    if B * A * N > _PALLAS_GATHER_MIN_ELEMS:
        from katacoffee_tpu.ops import gather_rows

        return gather_rows(tree.stats, cidx, use_pallas=True) * has[..., None]
    onehot = jax.nn.one_hot(cidx, N, dtype=jnp.float32) * has[..., None]
    return jnp.einsum("ban,bns->bas", onehot, tree.stats)


def _edge_stats_from_raw(tree: Tree, bidx, node, cs_raw, child_row=None, evis_row=None):
    """Per-action child stats with edge-scaled weights (NodeStats::childWeight,
    searchnode.h:59-64): w = childWeightSum * edgeVisits / max(childVisits,1).
    `cs_raw` [B, A', 8] is the children's raw stat rows (from
    _gather_child_stats, or the descent's per-level save buffer). Returns
    dict of [B, A'] arrays; missing edges have weight 0. `child_row` /
    `evis_row` optionally supply the node's child/edge-visit action lanes
    (e.g. compact [B,C] views) instead of full-width row reads."""
    child = tree.children[bidx, node] if child_row is None else child_row
    has = child >= 0
    cidx = jnp.maximum(child, 0)
    evis = (
        tree.edge_visits[bidx, node] if evis_row is None else evis_row
    ).astype(jnp.float32)
    cvis = cs_raw[..., S_VISITS]
    scale = evis / jnp.maximum(cvis, 1.0)
    live = has & (evis > 0)
    w = jnp.where(live, cs_raw[..., S_W] * scale, 0.0)
    # wsq scales by scale^2 so that downstream scalings compose to the
    # reference's weightScaling^2 on the RAW weightSqSum
    # (recomputeNodeStats, searchupdatehelpers.cpp:228,237: weightScaling =
    # desired/rawWeightSum, applied squared); this also keeps the per-child
    # ESS w^2/wsq invariant under edge scaling, matching the reference's use
    # of raw child stats for the LCB radius.
    wsq = jnp.where(live, cs_raw[..., S_WSQ] * scale * scale, 0.0)
    u = jnp.where(live, -cs_raw[..., S_U], 0.0)  # parent perspective
    usq = jnp.where(live, cs_raw[..., S_USQ], 0.0)
    wl = jnp.where(live, -cs_raw[..., S_WL], 0.0)
    draw = jnp.where(live, cs_raw[..., S_DRAW], 0.0)
    return dict(
        child=child, has=has, cidx=cidx, live=live,
        w=w, wsq=wsq, u=u, usq=usq, wl=wl, draw=draw,
        evis=evis, cvis=cvis,
    )


def _child_edge_stats(tree: Tree, bidx, node):
    return _edge_stats_from_raw(tree, bidx, node, _gather_child_stats(tree, bidx, node))


# ---------------------------------------------------------------------------
# Compact action lanes (interior nodes)
#
# Coffee's direction constraint (board.cpp:185-227) means every INTERIOR
# node's legal moves lie on the single line through its last move's spot
# along its direction: at most max(x,y) spots x 4 directions candidates —
# 20 lanes on 5x5 vs the full A=100 policy width (40 vs 400 on 10x10). The
# descent/backup hot loops therefore run on a compact [B, C] lane view per
# node (C = 4*max(x,y)), shrinking every per-level gather, select and
# recompute ~A/C x. Only the tree ROOT can have an unconstrained move (game
# start / D_NONE), so the root level is peeled out of the loop and handled
# full-width; storage stays full-width [B, N, A] (row reads/writes are
# bandwidth-cheap; it is the A-wide per-lane COMPUTE and the [B,A,N]
# one-hot gather materialization that dominate).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _cand_table_np(x_size: int, y_size: int, win_len: int):
    """[area+1, 5, C] int32: flat candidate actions for a node whose last
    move was (spot, dir); -1 padded. Rows spot=area / dir=4 (no last move —
    only the peeled root) are all -1. Built from the same lastline table as
    legal_mask so the geometry (incl. the reference's NW/NE same-cell quirk,
    board.cpp:194-209) matches exactly."""
    from katacoffee_tpu.game.board import _line_tables_np

    _, lastline, _, _ = _line_tables_np(x_size, y_size, win_len)
    area = x_size * y_size
    C = 4 * max(x_size, y_size)
    tab = np.full((area + 1, 5, C), -1, np.int32)
    for s in range(area):
        for d in range(4):
            spots = np.nonzero(lastline[s, d])[0]
            # ascending FLAT order (dir-major), so lane argmax breaks PUCT
            # ties exactly like the full-width argmax over flat actions
            acts = [dp * area + int(sp) for dp in range(4) for sp in spots]
            assert len(acts) <= C, (s, d, len(acts), C)
            tab[s, d, : len(acts)] = acts
    return tab


def _cand_lanes(cfg: GameConfig, states: GameState, bidx, node):
    """(cand [B,C] flat actions with -1 pad, valid [B,C]) for the nodes'
    last-move lines."""
    tab = jnp.asarray(_cand_table_np(cfg.x_size, cfg.y_size, cfg.win_len))
    s = states.last_spot[bidx, node]
    d = states.last_dir[bidx, node]
    s_safe = jnp.where(s < 0, cfg.area, s)
    d_safe = jnp.clip(d, 0, 4)
    cand = tab[s_safe, d_safe]
    return cand, cand >= 0


_HIGHEST = jax.lax.Precision.HIGHEST


def _compact_row(oh: jax.Array, row: jax.Array) -> jax.Array:
    """[B,C] = one-hot-selected entries of a full [B,A] row. One-hot matmul,
    not a [B,C]-indexed gather (those serialize on TPU — CLAUDE.md);
    HIGHEST precision so f32 payloads (priors, int-valued floats) survive
    exactly (default TPU matmul rounds operands to bf16)."""
    return jnp.einsum("bca,ba->bc", oh, row.astype(jnp.float32), precision=_HIGHEST)


def _select_action_compact(
    sp: SearchParams, prior: jax.Array, cs: dict, node_stats: jax.Array,
    self_u: jax.Array, forbid: jax.Array | None,
) -> jax.Array:
    """PUCT selection over compact lanes — exactly the is_root=False
    semantics of _select_action (no root prior/noise, no forced playouts,
    no rootHintLoc, non-root FPU constants). Returns the chosen LANE [B]."""
    child_w = cs["w"]
    child_q = cs["u"]
    has_child = cs["live"]
    total_child_w = child_w.sum(-1)

    cpuct = sp.cpuctExploration + sp.cpuctExplorationLog * jnp.log(
        (total_child_w + sp.cpuctExplorationBase) / sp.cpuctExplorationBase
    )
    if sp.cpuctUtilityStdevScale != 0.0:
        w_sum = node_stats[:, S_W]
        u = node_stats[:, S_U]
        usq = jnp.maximum(node_stats[:, S_USQ], u * u)
        var_prior = sp.cpuctUtilityStdevPrior**2
        pw = sp.cpuctUtilityStdevPriorWeight
        stdev = jnp.sqrt(
            jnp.maximum(
                0.0,
                ((u * u + var_prior) * pw + usq * w_sum)
                / (pw + jnp.maximum(w_sum - 1.0, _EPS))
                - u * u,
            )
        )
        stdev = jnp.where(w_sum <= 1.0, sp.cpuctUtilityStdevPrior, stdev)
        stdev_factor = 1.0 + sp.cpuctUtilityStdevScale * (
            stdev / sp.cpuctUtilityStdevPrior - 1.0
        )
    else:
        stdev_factor = jnp.ones(node_stats.shape[:1], jnp.float32)
    explore_scaling = cpuct * jnp.sqrt(total_child_w + 0.01) * stdev_factor

    legal_prior = jnp.maximum(prior, 0.0)
    mass_visited = jnp.where(has_child, legal_prior, 0.0).sum(-1)
    parent_u = node_stats[:, S_U]
    if sp.fpuParentWeightByVisitedPolicy:
        avg_w = jnp.minimum(1.0, mass_visited ** sp.fpuParentWeightByVisitedPolicyPow)
        parent_u = avg_w * parent_u + (1.0 - avg_w) * self_u
    elif sp.fpuParentWeight > 0.0:
        parent_u = sp.fpuParentWeight * self_u + (1.0 - sp.fpuParentWeight) * parent_u
    fpu = parent_u - sp.fpuReductionMax * jnp.sqrt(mass_visited)
    fpu = fpu + (-sp.winLossUtilityFactor - fpu) * sp.fpuLossProp

    q = jnp.where(has_child, child_q, fpu[:, None])
    selection = explore_scaling[:, None] * legal_prior / (1.0 + child_w) + q
    selection = jnp.where(prior < 0, -jnp.inf, selection)
    if forbid is not None:
        keep = ((prior >= 0.0) & ~forbid).any(-1)
        selection = jnp.where(forbid & keep[:, None], -jnp.inf, selection)
    return jnp.argmax(selection, axis=-1)


# scratch channel layout for the per-level save buffer: 8 child-stat
# channels + the node's compact prior/policy-rank/child-index/edge-visit
# lanes (immutable or patchable during one sim — backup re-reads nothing)
SC_PRIOR, SC_RANK, SC_CHILD, SC_EV = 8, 9, 10, 11
SC_WIDTH = 12


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


@jax.named_scope("ph_rootinit")
def init_tree(
    cfg: GameConfig,
    sp: SearchParams,
    eval_fn: EvalFn,
    root_states: GameState,
    max_nodes: int,
    rng: jax.Array,
    turn_number: jax.Array | None = None,
    root_hint: jax.Array | None = None,
    root_avoid: jax.Array | None = None,
) -> Tree:
    """Allocate trees and evaluate the roots (beginSearch equivalent without
    tree reuse). `turn_number` [B] drives early-game temperature interp.
    `root_hint` [B] = rootHintLoc action per game (-1 none). `root_avoid`
    [B,A] masks forbidden root moves (avoidMoves/allowMoves)."""
    k_eval, k_noise = jax.random.split(rng)
    res = _root_eval(cfg, sp, eval_fn, root_states, k_eval)
    return _tree_from_root_eval(
        cfg, sp, root_states, res, max_nodes, k_noise, turn_number, root_hint,
        root_avoid=root_avoid,
    )


def _tree_from_root_eval(
    cfg: GameConfig,
    sp: SearchParams,
    root_states: GameState,
    res: EvalResult,
    max_nodes: int,
    k_noise: jax.Array,
    turn_number: jax.Array | None = None,
    root_hint: jax.Array | None = None,
    root_avoid: jax.Array | None = None,
) -> Tree:
    B = root_states.board.shape[0]
    N = max_nodes
    A = cfg.policy_size
    if root_hint is None:
        root_hint = jnp.full((B,), -1, jnp.int32)

    def broadcast_slot(x):
        return jnp.broadcast_to(x[:, None, ...], (B, N) + x.shape[1:]).copy()

    states = jax.tree_util.tree_map(broadcast_slot, root_states)

    legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(root_states)

    root_policy = _blend_policy(res, sp.rootPolicyOptimism)
    raw_prior = jnp.where(legal, root_policy, -1.0)
    root_prior = _make_root_prior(
        cfg, sp, root_policy, legal, root_states, k_noise, turn_number, root_hint,
        root_avoid=root_avoid,
    )

    w0 = _eval_weight(sp, res.shortterm_error)
    root_term = root_states.done
    # a done root scores as a terminal from the mover's perspective
    term_util = _terminal_utility(root_states)
    u0 = jnp.where(root_term, term_util, res.utility)
    wl0 = jnp.where(root_term, term_util, res.wl)
    d0 = jnp.where(root_term, (root_states.winner == 0).astype(jnp.float32), res.draw)
    w0 = jnp.where(root_term, 1.0, w0)

    one = jnp.ones((B,), jnp.float32)
    stats0 = _stats_row(one, w0, w0 * w0, u0, u0 * u0, wl0, d0)  # [B, 8]
    selfs0 = jnp.stack([u0, wl0, d0, w0], axis=-1)

    root_hash = jax.vmap(functools.partial(situation_hash, cfg))(root_states)

    use_bias = sp.subtreeValueBiasFactor != 0.0
    K = BIAS_SLOTS if use_bias else 1
    bias_key0 = jnp.zeros((B, N), jnp.int32)
    if use_bias:
        bias_key0 = bias_key0.at[:, 0].set(_bias_keys(cfg, root_states))
    if sp.useNoisePruning:
        rank0 = _policy_ranks(raw_prior)
        policy_rank = jnp.zeros((B, N, A), jnp.int32).at[:, 0].set(rank0)
    else:
        policy_rank = jnp.zeros((B, 1, 1), jnp.int32)

    return Tree(
        states=states,
        stats=jnp.zeros((B, N, NUM_STATS), jnp.float32).at[:, 0].set(stats0),
        self_stats=jnp.zeros((B, N, NUM_SELF), jnp.float32).at[:, 0].set(selfs0),
        prior=jnp.zeros((B, N, A), jnp.float32).at[:, 0].set(raw_prior),
        root_prior=root_prior,
        children=jnp.full((B, N, A), -1, jnp.int32),
        edge_visits=jnp.zeros((B, N, A), jnp.int32),
        parent=jnp.full((B, N), -1, jnp.int32),
        parent_action=jnp.full((B, N), -1, jnp.int32),
        is_terminal=jnp.zeros((B, N), bool).at[:, 0].set(root_term),
        node_count=jnp.ones((B,), jnp.int32),
        sit_hash=jnp.zeros((B, N, 2), jnp.uint32).at[:, 0].set(root_hash),
        policy_rank=policy_rank,
        bias_key=bias_key0,
        last_bias_delta=jnp.zeros((B, N), jnp.float32),
        last_bias_weight=jnp.zeros((B, N), jnp.float32),
        bias_table=jnp.zeros((B, K, 2), jnp.float32),
        root_hint=root_hint,
    )


@functools.lru_cache(maxsize=None)
def _sym_action_table(cfg: GameConfig):
    """[8, A] int32: each action's image under each dihedral symmetry
    (pure numpy — jnp ops would trace; this runs inside jit tracing)."""
    from katacoffee_tpu.game import symmetry as S

    A = cfg.policy_size
    area = cfg.area
    nsym = S.num_symmetries(cfg)
    table = np.zeros((nsym, A), np.int32)
    for s in range(nsym):
        dperm = S.dir_perm(s)
        for a in range(A):
            d, spot = a // area, a % area
            x, y = spot % cfg.x_size, spot // cfg.x_size
            if S.is_flip_x(s):
                x = cfg.x_size - 1 - x
            if S.is_flip_y(s):
                y = cfg.y_size - 1 - y
            if S.is_transpose(s):
                x, y = y, x
            table[s, a] = dperm[d] * area + y * cfg.x_size + x
    return table


def _root_symmetry_prune(cfg: GameConfig, states: GameState, prior: jax.Array) -> jax.Array:
    """rootSymmetryPruning (gtp_example.cfg:243): for each game, find the
    symmetries that stabilize the root position and mask every legal move
    that is not the minimal action in its orbit — symmetric duplicates get
    no visits, concentrating search (8× on the empty board)."""
    from katacoffee_tpu.game import symmetry as S

    B = prior.shape[0]
    table = jnp.asarray(_sym_action_table(cfg))  # [nsym, A]
    stab = []
    for s in range(S.num_symmetries(cfg)):
        ts = jax.vmap(lambda st, s=s: S.apply_state(cfg, s, st).board)(states)
        same_board = (ts == states.board).all(axis=(-1, -2))
        spot_t = jax.vmap(lambda st, s=s: S.apply_spot(cfg, s, jnp.maximum(st.last_spot, 0)))(states)
        dir_t = jax.vmap(lambda st, s=s: S.apply_direction(s, jnp.minimum(st.last_dir, 3)))(states)
        no_last = states.last_spot < 0
        same_last = no_last | ((spot_t == states.last_spot) & (dir_t == states.last_dir))
        stab.append(same_board & same_last)
    stab = jnp.stack(stab, axis=1)  # [B, nsym]; identity always True

    A = prior.shape[-1]
    big = jnp.asarray(A, jnp.int32)
    imgs = jnp.where(stab[:, :, None], table[None, :, :], big)  # [B, 8, A]
    min_img = imgs.min(axis=1)  # [B, A]
    canonical = min_img >= jnp.arange(A)[None, :]
    return jnp.where(canonical, prior, -1.0)


@jax.named_scope("ph_rootprior")
def _make_root_prior(
    cfg, sp: SearchParams, policy, legal, root_states, k_noise, turn_number,
    root_hint: jax.Array | None = None,
    root_avoid: jax.Array | None = None,
):
    """Root policy temperature (early-game interpolated) + Dirichlet noise
    (searchhelpers.cpp maybeAddPolicyNoiseAndTemp), the rootHintLoc 2%%
    policy shift (searchhelpers.cpp:206-218), plus optional root symmetry
    pruning (a hinted action is exempted from pruning) and avoid-move
    masking (`root_avoid` [B,A] True = forbidden at root — the
    avoidMoves/allowMoves restriction of analysis.cpp:106-191; a mask that
    would leave no legal root move is ignored for that game, like the
    reference falling back when avoidMoveUntilByLoc empties the root)."""
    if turn_number is None:
        turn_number = root_states.num_turns.astype(jnp.float32)
    else:
        turn_number = turn_number.astype(jnp.float32)

    if sp.rootPolicyTemperature != 1.0 or sp.rootPolicyTemperatureEarly != 1.0:
        halflife = sp.chosenMoveTemperatureHalflife
        frac = 0.5 ** (turn_number / halflife)
        temp = sp.rootPolicyTemperature + frac * (
            sp.rootPolicyTemperatureEarly - sp.rootPolicyTemperature
        )
        logp = jnp.log(jnp.maximum(policy, 1e-30)) / temp[:, None]
        logp = jnp.where(legal, logp, -jnp.inf)
        policy = jax.nn.softmax(logp, axis=-1)
        policy = jnp.where(legal, policy, 0.0)

    if sp.rootNoiseEnabled:
        policy = _add_dirichlet_noise(sp, k_noise, policy, legal)

    if root_hint is not None:
        # move 2% of the total legal mass onto the hint move
        # (searchhelpers.cpp:206-218)
        has_hint = root_hint >= 0
        hint_safe = jnp.maximum(root_hint, 0)
        bidx = jnp.arange(policy.shape[0])
        hint_legal = has_hint & legal[bidx, hint_safe]
        prop = 0.02
        moved = jnp.where(legal, policy, 0.0).sum(-1) * prop
        shifted = policy * (1.0 - prop)
        shifted = shifted.at[bidx, hint_safe].add(moved)
        policy = jnp.where(hint_legal[:, None], shifted, policy)

    if root_avoid is not None:
        masked_legal = legal & ~root_avoid
        any_left = masked_legal.any(-1)
        legal = jnp.where(any_left[:, None], masked_legal, legal)
        policy = jnp.where(legal, policy, 0.0)

    out = jnp.where(legal, policy, -1.0)
    if sp.rootSymmetryPruning:
        pruned = _root_symmetry_prune(cfg, root_states, out)
        if root_hint is not None:
            # never prune the hinted action itself
            bidx = jnp.arange(policy.shape[0])
            hint_safe = jnp.maximum(root_hint, 0)
            restore = (root_hint >= 0) & (out[bidx, hint_safe] >= 0)
            pruned = pruned.at[bidx, hint_safe].set(
                jnp.where(restore, out[bidx, hint_safe], pruned[bidx, hint_safe])
            )
        out = pruned
    return out


def _add_dirichlet_noise(sp, rng, policy, legal):
    """KataGo alpha allocation: half uniform, half excess-log-policy shaped
    (searchhelpers.cpp computeDirichletAlphaDistribution + addDirichletNoise).
    """
    legal_f = legal.astype(jnp.float32)
    n_legal = jnp.maximum(legal_f.sum(-1, keepdims=True), 1.0)
    logp = jnp.log(jnp.minimum(policy, 0.01) + 1e-20)
    log_mean = jnp.where(legal, logp, 0.0).sum(-1, keepdims=True) / n_legal
    excess = jnp.where(legal, jnp.maximum(logp - log_mean, 0.0), 0.0)
    excess_sum = excess.sum(-1, keepdims=True)
    shaped = jnp.where(excess_sum > 0, excess / jnp.maximum(excess_sum, 1e-20), legal_f / n_legal)
    alpha_prop = 0.5 * legal_f / n_legal + 0.5 * shaped
    alpha = alpha_prop * sp.rootDirichletNoiseTotalConcentration
    g = jax.random.gamma(rng, jnp.maximum(alpha, 1e-10))
    g = jnp.where(legal & (alpha > 0), g, 0.0)
    noise = g / jnp.maximum(g.sum(-1, keepdims=True), 1e-20)
    w = sp.rootDirichletNoiseWeight
    return jnp.where(legal, noise * w + policy * (1.0 - w), 0.0)


# ---------------------------------------------------------------------------
# Selection
# ---------------------------------------------------------------------------


@jax.named_scope("ph_select")
def _select_action(
    cfg, sp: SearchParams, tree: Tree, node: jax.Array, is_root: jax.Array, cs=None,
    forbid: jax.Array | None = None,
):
    """Vectorized selectBestChildToDescend (searchexplorehelpers.cpp:304-451).
    node: [B] current node per game. `cs` lets the caller pass precomputed
    child-edge stats. `forbid` [B,A] True = excluded at this node (the
    depth-limited avoidMoveUntilByLoc gating, searchexplorehelpers.cpp:
    416-421; a mask that would exclude every legal move is ignored for that
    game, like the reference's root fallback). Returns chosen action [B]."""
    B = node.shape[0]
    bidx = jnp.arange(B)

    raw_prior = tree.prior[bidx, node]  # [B, A]
    prior = jnp.where(is_root[:, None], tree.root_prior, raw_prior)
    if cs is None:
        cs = _child_edge_stats(tree, bidx, node)
    child_w = cs["w"]
    child_q = cs["u"]
    has_child = cs["live"]

    node_stats = tree.stats[bidx, node]  # [B, 8]
    total_child_w = child_w.sum(-1)

    # cpuct and explore scaling (searchexplorehelpers.cpp:9-25)
    cpuct = sp.cpuctExploration + sp.cpuctExplorationLog * jnp.log(
        (total_child_w + sp.cpuctExplorationBase) / sp.cpuctExplorationBase
    )
    # parent utility stdev factor (searchexplorehelpers.cpp:262-285)
    if sp.cpuctUtilityStdevScale != 0.0:
        w_sum = node_stats[:, S_W]
        u = node_stats[:, S_U]
        usq = jnp.maximum(node_stats[:, S_USQ], u * u)
        var_prior = sp.cpuctUtilityStdevPrior**2
        pw = sp.cpuctUtilityStdevPriorWeight
        stdev = jnp.sqrt(
            jnp.maximum(
                0.0,
                ((u * u + var_prior) * pw + usq * w_sum) / (pw + jnp.maximum(w_sum - 1.0, _EPS))
                - u * u,
            )
        )
        stdev = jnp.where(w_sum <= 1.0, sp.cpuctUtilityStdevPrior, stdev)
        stdev_factor = 1.0 + sp.cpuctUtilityStdevScale * (
            stdev / sp.cpuctUtilityStdevPrior - 1.0
        )
    else:
        stdev_factor = jnp.ones((B,), jnp.float32)
    explore_scaling = cpuct * jnp.sqrt(total_child_w + 0.01) * stdev_factor

    # FPU (searchexplorehelpers.cpp:286-300)
    legal_prior = jnp.maximum(prior, 0.0)
    mass_visited = jnp.where(has_child, legal_prior, 0.0).sum(-1)
    parent_u = node_stats[:, S_U]
    if sp.fpuParentWeightByVisitedPolicy:
        # searchexplorehelpers.cpp:281-284: weight the aggregated parent
        # utility by visitedPolicyMass^pow, the raw NN utility by the rest —
        # a barely-visited parent's FPU leans on the net, a well-explored
        # one on its subtree average.
        avg_w = jnp.minimum(
            1.0, mass_visited ** sp.fpuParentWeightByVisitedPolicyPow
        )
        parent_u = avg_w * parent_u + (1.0 - avg_w) * tree.self_stats[bidx, node, F_U]
    elif sp.fpuParentWeight > 0.0:
        parent_u = (
            sp.fpuParentWeight * tree.self_stats[bidx, node, F_U]
            + (1.0 - sp.fpuParentWeight) * parent_u
        )
    red_max = jnp.where(is_root, sp.rootFpuReductionMax, sp.fpuReductionMax)
    loss_prop = jnp.where(is_root, sp.rootFpuLossProp, sp.fpuLossProp)
    fpu = parent_u - red_max * jnp.sqrt(mass_visited)
    fpu = fpu + (-sp.winLossUtilityFactor - fpu) * loss_prop

    q = jnp.where(has_child, child_q, fpu[:, None])
    selection = explore_scaling[:, None] * legal_prior / (1.0 + child_w) + q
    selection = jnp.where(prior < 0, -jnp.inf, selection)

    # Root forced playouts (searchexplorehelpers.cpp:150): a child with >0
    # visits is forced until it has sqrt(coeff * P * totalChildWeight) visits.
    # `force_w` excludes virtual-loss weight (K-round root sequencing) so an
    # unexpanded claimed edge can never be force-selected by its own claim.
    if sp.rootDesiredPerChildVisitsCoeff > 0.0:
        fw = cs.get("force_w", child_w)
        forced = jnp.sqrt(
            sp.rootDesiredPerChildVisitsCoeff * legal_prior * total_child_w[:, None]
        )
        force = has_child & (fw < forced) & (fw > 0.0)
        force = force & is_root[:, None]
        selection = jnp.where(force, jnp.inf, selection)

    # rootHintLoc forced selection (searchexplorehelpers.cpp:155-168): the
    # hint move is forced while its weight (plus ~one visit's worth) trails
    # 80% of the heaviest sibling's.
    hint = tree.root_hint
    hint_safe = jnp.maximum(hint, 0)
    has_hint = (hint >= 0) & is_root
    if True:  # cheap [B] ops; root_hint is -1 everywhere when unused
        pwpv = node_stats[:, S_W] / jnp.maximum(node_stats[:, S_VISITS], 1.0)
        hint_w = child_w[bidx, hint_safe]
        hint_v = cs["cvis"][bidx, hint_safe]
        avg_wpv = (hint_w + pwpv) / (hint_v + 1.0)
        max_sib = child_w.max(-1)
        force_hint = (
            has_hint
            & (hint_w + avg_wpv < 0.8 * max_sib)
            & (prior[bidx, hint_safe] >= 0)
        )
        selection = selection.at[bidx, hint_safe].set(
            jnp.where(force_hint, jnp.inf, selection[bidx, hint_safe])
        )

    if forbid is not None:
        # the reference gates candidate moves BEFORE scoring, so an avoided
        # move can never be forced by forced-playouts/hint either — applying
        # the mask last preserves that (avoid wins over every forcing rule)
        keep = ((prior >= 0.0) & ~forbid).any(-1)
        selection = jnp.where(forbid & keep[:, None], -jnp.inf, selection)

    return jnp.argmax(selection, axis=-1)


# ---------------------------------------------------------------------------
# One simulation for all B games
# ---------------------------------------------------------------------------


def make_sim_scratch(cfg, tree: Tree, max_depth: int) -> jax.Array:
    """Scratch buffer for the descent's per-level save (compact lanes; slot
    j holds interior level j+1): 8 child-stat channels + the node's compact
    prior/rank/child/edge lanes (SC_* layout). Allocate ONCE and thread
    through the sim loop — re-zeroing every sim costs ~50µs; stale slots are
    only ever read masked."""
    B = tree.stats.shape[0]
    C = 4 * max(cfg.x_size, cfg.y_size)
    return jnp.zeros((B, max_depth + 1, C, SC_WIDTH), jnp.float32)


def _simulate_once(
    cfg, sp: SearchParams, eval_fn: EvalFn, tree: Tree, rng, max_depth: int,
    active: jax.Array | None = None,
    scratch: jax.Array | None = None,
    avoid_until: jax.Array | None = None,
    root_cs: jax.Array | None = None,
):
    """One playout per game. `active` [B] masks out games whose playout is a
    no-op (used by visit-target searches over reused trees). `scratch` from
    make_sim_scratch is threaded through by callers to avoid per-sim
    allocation; returns (tree, rng, scratch, root_cs).

    `root_cs` [B, A, 8] is the ROOT's child-stats gather carried across the
    sims of one move: in the graded DAG a depth-1 node's stats only change
    when it is the sim's own root-path child, so each sim patches exactly
    the column it visited and the full-width [B,A,N] root gather happens
    once per move instead of once per sim. None = gather fresh (exact).

    `avoid_until` [B,2,A] int32 (index 1 = P_BLACK's avoid row, 2 = white's,
    0-based): action a is excluded for the node's mover p at descent depth d
    iff avoid_until[b, p-1, a] > d — the reference's avoidMoveUntilByLoc
    depth gating (searchexplorehelpers.cpp:395-421; depth = plies below the
    root). None (the selfplay path) compiles to no extra ops."""
    B = tree.stats.shape[0]
    A2 = tree.prior.shape[-1]
    bidx = jnp.arange(B)
    k_leak, k_eval, rng = jax.random.split(rng, 3)
    act_mask = jnp.ones((B,), bool) if active is None else active

    # ---------------- Descent ----------------
    # Walk down until a missing edge (expand), a terminal node (revisit), or
    # an edge-visit catch-up stop. Record the node path and per-level actions.
    # The ROOT level is peeled (full A-wide — a game-start root has no
    # direction constraint); interior levels run on compact candidate lanes
    # (see the compact-lanes section above).
    N_ = tree.stats.shape[1]
    C_ = 4 * max(cfg.x_size, cfg.y_size)
    path0 = jnp.full((B, max_depth + 1), -1, jnp.int32).at[:, 0].set(0)
    acts0 = jnp.zeros((B, max_depth + 1), jnp.int32)
    zero = jnp.zeros((B,), jnp.int32)
    ones_b = jnp.ones((B,), bool)

    def want_catch_at(ev_lane, cidx, has_child, depth_lane, fold):
        """edge-visit catch-up test (search.cpp:1169-1206)."""
        if not sp.useGraphSearch:
            return jnp.zeros((B,), bool)
        cvis = tree.stats[bidx, cidx, S_VISITS]
        wc = has_child & (ev_lane.astype(jnp.float32) < cvis - 0.5)
        if sp.graphSearchCatchUpLeakProb > 0.0:
            leak_key = jax.random.fold_in(k_leak, 0)
            u = jax.random.uniform(jax.random.fold_in(leak_key, 1), (B, max_depth + 1))
            leak = u[bidx, jnp.minimum(depth_lane, max_depth)] < sp.graphSearchCatchUpLeakProb
            wc = wc & ~leak
        return wc

    # --- root level (full width; forced playouts / hint / noise live here) ---
    with jax.named_scope("ph_descent"):
        root_term = tree.is_terminal[:, 0]
        root_cs_raw = (
            root_cs if root_cs is not None else _gather_child_stats(tree, bidx, zero)
        )  # [B, A, 8]
        cs0 = _edge_stats_from_raw(tree, bidx, zero, root_cs_raw)
        if avoid_until is not None:
            pidx0 = jnp.clip(tree.states.to_move[:, 0].astype(jnp.int32) - 1, 0, 1)
            forbid0 = avoid_until[bidx, pidx0] > 0
        else:
            forbid0 = None
        act0 = _select_action(cfg, sp, tree, zero, ones_b, cs=cs0, forbid=forbid0)
        child0 = tree.children[bidx, 0, act0]
        has_child0 = child0 >= 0
        want_catch0 = want_catch_at(
            tree.edge_visits[bidx, 0, act0], jnp.maximum(child0, 0), has_child0, zero,
            0,
        )
        stop0 = root_term | want_catch0 | ~has_child0
        move_on0 = ~stop0
        # root edge-visit increment: static row 0, row RMW (layout — see the
        # interior loop's comment)
        inc0 = (
            (act0[:, None] == jnp.arange(A2)[None, :])
            & (move_on0 & act_mask)[:, None]
        ).astype(jnp.int32)
        ev0 = tree.edge_visits.at[:, 0].add(inc0)
        node1 = jnp.where(move_on0, jnp.maximum(child0, 0), zero)
        depth1 = move_on0.astype(jnp.int32)
        path1 = path0.at[:, 1].set(jnp.where(move_on0, node1, path0[:, 1]))
        catch1 = want_catch0 & ~root_term
        active1 = move_on0 & (1 < max_depth)

        # --- interior levels (compact lanes) ---
        def cond(carry):
            return jnp.any(carry[2])

        # edge_visits rides the loop as a MUTABLE carry; traversed edges are
        # incremented as we walk (the reference's addEdgeVisits on the unwind
        # — order is irrelevant for counts; a path never repeats an edge in
        # the graded DAG). Updates are ROW read-modify-writes, never element
        # scatters: TPU element scatters on [B,N,A] emit a B-minor {0,1,2}
        # layout while the row gathers want A-minor {2,0,1}, so the element
        # form made XLA insert a 37MB layout copy per sim (round-4 split).
        def body(carry):
            node, depth, active_, path, acts, catch, ev, it, save = carry
            term = tree.is_terminal[bidx, node]
            cand, valid = _cand_lanes(cfg, tree.states, bidx, node)  # [B, C]
            oh = (
                (cand[:, :, None] == jnp.arange(A2)[None, None, :])
                & valid[:, :, None]
            ).astype(jnp.float32)  # [B, C, A]
            ev_row = ev[bidx, node]  # [B, A] int row (reused by the RMW below)
            # ONE stacked compaction matmul for all per-node rows: per-level
            # cost here is op-count-bound (round-5 phase split), so four
            # separate [B,C]x[B,A] contractions lose to one [B,A,S] stack
            rows = [
                tree.children[bidx, node].astype(jnp.float32),
                ev_row.astype(jnp.float32),
                tree.prior[bidx, node],
            ]
            if sp.useNoisePruning:
                rows.append(tree.policy_rank[bidx, node].astype(jnp.float32))
            stacked = jnp.stack(rows, axis=-1)  # [B, A, S]
            comp = jnp.einsum("bca,bas->bcs", oh, stacked, precision=_HIGHEST)
            child_c_f = comp[..., 0]
            child_c = jnp.where(valid, child_c_f.astype(jnp.int32), -1)
            ev_c = comp[..., 1]  # exact ints as f32
            prior_c = jnp.where(valid, comp[..., 2], -1.0)
            if sp.useNoisePruning:
                rank_c = jnp.where(valid, comp[..., 3], 1e6)
            else:
                rank_c = jnp.zeros_like(ev_c)
            # children's raw stat rows over the compact lanes (the [B,C,N]
            # one-hot materialization is the whole point: ~A/C x smaller
            # than the full-width [B,A,N] gather)
            has_c = child_c >= 0
            cidx_c = jnp.maximum(child_c, 0)
            with jax.named_scope("ph_gather"):
                onehot_n = jax.nn.one_hot(cidx_c, N_, dtype=jnp.float32) * has_c[..., None]
                cs_raw = jnp.einsum("bcn,bns->bcs", onehot_n, tree.stats)
            # per-level save for backup: stats + the node's immutable lanes
            lvl = jnp.concatenate(
                [
                    cs_raw,
                    prior_c[..., None], rank_c[..., None],
                    child_c_f[..., None], ev_c[..., None],
                ],
                axis=-1,
            )
            save = jax.lax.dynamic_update_index_in_dim(save, lvl, it, 1)

            cs = _edge_stats_from_raw(
                tree, bidx, node, cs_raw, child_row=child_c, evis_row=ev_c
            )
            if avoid_until is not None:
                pidx = jnp.clip(
                    tree.states.to_move[bidx, node].astype(jnp.int32) - 1, 0, 1
                )
                forbid_c = _compact_row(oh, avoid_until[bidx, pidx]) > depth[:, None]
            else:
                forbid_c = None
            act_c = _select_action_compact(
                sp, prior_c, cs,
                tree.stats[bidx, node], tree.self_stats[bidx, node, F_U], forbid_c,
            )
            child = child_c[bidx, act_c]
            has_child = child >= 0
            cidx = jnp.maximum(child, 0)
            flat_act = cand[bidx, act_c]  # -1 only for dead/masked games
            want_catch = want_catch_at(ev_c[bidx, act_c], cidx, has_child, depth, it)

            stop = term | want_catch | ~has_child
            move_on = active_ & ~stop
            acts = acts.at[bidx, jnp.where(active_ & ~term, depth, max_depth)].set(
                jnp.where(active_ & ~term, act_c, acts[:, max_depth])
            )
            inc_row = (
                (flat_act[:, None] == jnp.arange(A2)[None, :])
                & (move_on & act_mask)[:, None]
            ).astype(jnp.int32)
            ev = ev.at[bidx, node].set(ev_row + inc_row)
            new_node = jnp.where(move_on, cidx, node)
            new_depth = jnp.where(move_on, depth + 1, depth)
            path = path.at[bidx, jnp.where(move_on, new_depth, 0)].set(
                jnp.where(move_on, new_node, path[:, 0])
            )
            catch = catch | (active_ & want_catch & ~term)
            new_active = move_on & (new_depth < max_depth)
            return new_node, new_depth, new_active, path, acts, catch, ev, it + 1, save

        save0 = scratch if scratch is not None else make_sim_scratch(cfg, tree, max_depth)
        leaf, leaf_depth, _, path, act_path_c, caught, ev_out, _, level_stats = (
            jax.lax.while_loop(
                cond,
                body,
                (
                    node1, depth1, active1, path1, acts0, catch1,
                    ev0, jnp.asarray(0, jnp.int32), save0,
                ),
            )
        )
    tree = tree._replace(edge_visits=ev_out)
    # the stopping edge's FLAT action: root stop -> act0; interior stop ->
    # the recorded compact lane mapped through the leaf's candidate table
    leaf_cand, _ = _cand_lanes(cfg, tree.states, bidx, leaf)
    flat_stop = leaf_cand[bidx, jnp.clip(act_path_c[bidx, leaf_depth], 0, C_ - 1)]
    action = jnp.where(leaf_depth == 0, act0, flat_stop)
    action = jnp.clip(action, 0, A2 - 1)  # terminal/dead lanes -> benign index

    caught = caught & act_mask
    # Depth-capped playouts (leaf_depth == max_depth — only possible with a
    # finite maxPlayoutDepthProp cap) already counted their final traversed
    # edge in-loop; they expand nothing and back up from the final parent,
    # exactly the catch-up bookkeeping. Their recorded stopping action is
    # the dustbin slot — zero it so the (discarded) env step stays benign.
    depth_capped = (leaf_depth >= max_depth) & act_mask
    action = jnp.where(depth_capped, 0, action)
    leaf_terminal = tree.is_terminal[bidx, leaf] & act_mask & ~depth_capped
    expanding = (
        ~tree.is_terminal[bidx, leaf] & ~caught & ~depth_capped & act_mask
    )

    # ---------------- Expansion ----------------
    # For expanding games: step the env, evaluate, then either link to a
    # transposed existing node (graph search) or allocate a new slot.
    with jax.named_scope("ph_expand"):
        leaf_states = jax.tree_util.tree_map(lambda x: x[bidx, leaf], tree.states)
        new_states = jax.vmap(functools.partial(step, cfg))(leaf_states, action)
        with jax.named_scope("ph_nneval"):
            res = eval_fn(new_states, k_eval)

        if sp.useGraphSearch:
            new_hash = jax.vmap(functools.partial(situation_hash, cfg))(new_states)  # [B,2]
            slot_valid = jnp.arange(tree.stats.shape[1])[None, :] < tree.node_count[:, None]
            # compare both hash words with a minor-dim reduce; slicing the words
            # out separately made XLA pick a channel-major layout for sit_hash
            # and insert a transpose copy every sim (profiled)
            hmatch = slot_valid & (tree.sit_hash == new_hash[:, None, :]).all(-1)
            found = hmatch.any(axis=1) & expanding
            found_idx = jnp.argmax(hmatch, axis=1)
        else:
            found = jnp.zeros((B,), bool)
            found_idx = jnp.zeros((B,), jnp.int32)

        new_idx = tree.node_count  # [B] next free slot
        capacity_ok = new_idx < tree.stats.shape[1]
        do_alloc = expanding & ~found & capacity_ok
        do_link = expanding & found
        overflow = expanding & ~found & ~capacity_ok

        new_terminal = new_states.done
        term_util = _terminal_utility(new_states)
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(new_states)
        new_prior = jnp.where(legal, _blend_policy(res, sp.policyOptimism), -1.0)
        u_raw = jnp.where(new_terminal, term_util, res.utility)
        wl_new = jnp.where(new_terminal, term_util, res.wl)
        d_new = jnp.where(new_terminal, (new_states.winner == 0).astype(jnp.float32), res.draw)
        w_new = jnp.where(new_terminal, 1.0, _eval_weight(sp, res.shortterm_error))

        use_bias = sp.subtreeValueBiasFactor != 0.0
        if use_bias:
            new_keys = _bias_keys(cfg, new_states)
            # addLeafValue: bias the initial utility toward the table entry
            u_init = u_raw + jnp.where(new_terminal, 0.0, _bias_avg(sp, tree, bidx, new_keys))
        else:
            new_keys = jnp.zeros((B,), jnp.int32)
            u_init = u_raw

        slot = jnp.where(do_alloc, new_idx, 0)  # slot-0 writes are masked out

        def upd(arr, val):
            old = arr[bidx, slot]
            return arr.at[bidx, slot].set(jnp.where(do_alloc, val, old))

        def upd_row(arr, val):
            old = arr[bidx, slot]
            return arr.at[bidx, slot].set(jnp.where(do_alloc[:, None], val, old))

        if sp.useGraphSearch:
            sit_hash = upd_row(tree.sit_hash, new_hash)
        else:
            sit_hash = tree.sit_hash

        one = jnp.ones((B,), jnp.float32)
        new_stats_row = _stats_row(one, w_new, w_new * w_new, u_init, u_init * u_init, wl_new, d_new)
        new_self_row = jnp.stack([u_raw, wl_new, d_new, w_new], axis=-1)

        new_child_idx = jnp.where(do_link, found_idx, new_idx)
        tree = tree._replace(
            states=jax.tree_util.tree_map(
                lambda full, new: full.at[bidx, slot].set(
                    jnp.where(
                        jnp.reshape(do_alloc, (B,) + (1,) * (new.ndim - 1)),
                        new,
                        full[bidx, slot],
                    )
                ),
                tree.states,
                new_states,
            ),
            stats=upd_row(tree.stats, new_stats_row),
            self_stats=upd_row(tree.self_stats, new_self_row),
            prior=upd_row(tree.prior, new_prior),
            policy_rank=(
                tree.policy_rank.at[bidx, slot].set(
                    jnp.where(
                        do_alloc[:, None],
                        _policy_ranks(new_prior),
                        tree.policy_rank[bidx, slot],
                    )
                )
                if sp.useNoisePruning
                else tree.policy_rank
            ),
            parent=upd(tree.parent, leaf),
            parent_action=upd(tree.parent_action, action),
            is_terminal=upd(tree.is_terminal, new_terminal),
            sit_hash=sit_hash,
            bias_key=upd(tree.bias_key, new_keys) if use_bias else tree.bias_key,
            # Child-link write in ROW form (same layout rationale as the
            # descent loop's edge-visit row write: element scatters on
            # [B,N,A] force a B-minor layout + a per-sim conversion copy).
            children=tree.children.at[bidx, leaf].set(
                jnp.where(
                    (action[:, None] == jnp.arange(A2)[None, :])
                    & (do_alloc | do_link)[:, None],
                    new_child_idx[:, None],
                    tree.children[bidx, leaf],
                )
            ),
            node_count=tree.node_count + do_alloc.astype(jnp.int32),
        )

        # Stopping-edge visit bookkeeping (row form, see above):
        #  * alloc/link: this playout traverses the new/linked edge once
        #  * catch-up: claim exactly one edge visit (search.cpp:1199)
        edge_inc = (do_alloc | do_link | caught).astype(jnp.int32)
        tree = tree._replace(
            edge_visits=tree.edge_visits.at[bidx, leaf].set(
                tree.edge_visits[bidx, leaf]
                + (action[:, None] == jnp.arange(A2)[None, :]).astype(jnp.int32)
                * edge_inc[:, None]
            )
        )

        # Terminal leaf (or capacity overflow): re-add its stored value
        # (search.cpp:943-952) incrementally — terminal nodes have no children.
        revisit = leaf_terminal | overflow
        leaf_row = tree.stats[bidx, leaf]  # [B, 8]
        leaf_self = tree.self_stats[bidx, leaf]
        lw = leaf_self[:, F_W]
        old_ws = leaf_row[:, S_W]
        new_ws = old_ws + lw
        inv = 1.0 / jnp.maximum(new_ws, _EPS)
        lu = leaf_self[:, F_U]
        revisit_row = _stats_row(
            leaf_row[:, S_VISITS] + 1.0,
            new_ws,
            leaf_row[:, S_WSQ] + lw * lw,
            (leaf_row[:, S_U] * old_ws + lu * lw) * inv,
            (leaf_row[:, S_USQ] * old_ws + lu * lu * lw) * inv,
            (leaf_row[:, S_WL] * old_ws + leaf_self[:, F_WL] * lw) * inv,
            (leaf_row[:, S_DRAW] * old_ws + leaf_self[:, F_DRAW] * lw) * inv,
        )
        tree = tree._replace(
            stats=tree.stats.at[bidx, leaf].set(
                jnp.where(revisit[:, None], revisit_row, leaf_row)
            )
        )

        # (traversed-edge visits were already added during the descent loop)

    # ---------------- Backup ----------------
    # Recompute stats bottom-up along the path (updateStatsAfterPlayout →
    # recomputeNodeStats, searchupdatehelpers.cpp:125-337). For a terminal/
    # overflow revisit the leaf was updated incrementally above, so start at
    # its parent; for expansion/link/catch-up start at the stopping node
    # itself (its child edges changed).
    with jax.named_scope("ph_backup"):
        limit = jnp.where(revisit | depth_capped, leaf_depth - 1, leaf_depth)
        new_child_linked = jnp.where(do_alloc | do_link, new_child_idx, -1)

        # The loop carry holds ONLY the arrays backup mutates (stats + the bias
        # state). Carrying the whole Tree made XLA copy the untouched [B,N,A]
        # buffers (children, edge_visits, prior, …) in and out of the loop every
        # level — ~350µs/sim of pure buffer copies, profiled at B=256.
        # Interior levels recompute on the descent's saved COMPACT lanes —
        # no full-width re-gathers at all; the only fresh reads are the path
        # child's stats row and the handful of patches below. The root level
        # runs full-width after the loop (its forced/noise machinery and
        # unconstrained width live there).
        def backup_level(i, mut):
            if use_bias:
                tr = tree._replace(
                    stats=mut[0],
                    bias_table=mut[1],
                    last_bias_delta=mut[2],
                    last_bias_weight=mut[3],
                )
            else:
                tr = tree._replace(stats=mut[0])
            l = max_depth - i  # interior level, >= 1
            n = path[:, l]
            on_path = (l <= limit) & (n >= 0) & (l <= leaf_depth) & act_mask
            lc = jnp.minimum(l, max_depth)
            sv = jax.lax.dynamic_index_in_dim(level_stats, lc - 1, 1, keepdims=False)
            cs_raw = sv[..., :NUM_STATS]
            prior_c = sv[..., SC_PRIOR]
            rank_c = sv[..., SC_RANK]
            child_c = sv[..., SC_CHILD].astype(jnp.int32)
            ev_c = sv[..., SC_EV]
            bidx_ = jnp.arange(n.shape[0])
            pa = act_path_c[bidx_, lc]  # compact lane this playout took
            at_stop = l == leaf_depth
            # patch 1: the stopping node's new/linked child (saved row predates
            # the expansion's link write)
            child_c = child_c.at[bidx_, pa].set(
                jnp.where(
                    at_stop & (new_child_linked >= 0),
                    new_child_linked,
                    child_c[bidx_, pa],
                )
            )
            # patch 2: edge visits (saved lanes predate the in-loop traversal
            # increment and the expansion's stopping-edge increment)
            ev_c = ev_c.at[bidx_, pa].add(
                jnp.where(
                    at_stop,
                    edge_inc.astype(jnp.float32),
                    jnp.where(l < leaf_depth, 1.0, 0.0),
                )
            )
            # patch 3: the path child's stats row, re-read fresh (the only
            # child whose stats this playout changed — the DAG is graded)
            pchild = child_c[bidx_, pa]
            pok = pchild >= 0
            prow = tr.stats[bidx_, jnp.maximum(pchild, 0)]
            cs_raw = cs_raw.at[bidx_, pa].set(
                jnp.where(pok[:, None], prow, cs_raw[bidx_, pa])
            )
            tr = _recompute_node(
                cfg, sp, tr, n, on_path, cs_raw=cs_raw,
                lanes=dict(
                    child_row=child_c, evis_row=ev_c,
                    prior_row=prior_c, rank_row=rank_c,
                ),
            )
            if use_bias:
                return (tr.stats, tr.bias_table, tr.last_bias_delta, tr.last_bias_weight)
            return (tr.stats,)

        # only levels up to the deepest leaf in the batch do any work; dynamic
        # lower bound turns the fixed board-area unroll into ~actual-depth trips
        deepest = jnp.max(jnp.where(act_mask, limit, 0))
        if use_bias:
            mut0 = (tree.stats, tree.bias_table, tree.last_bias_delta, tree.last_bias_weight)
        else:
            mut0 = (tree.stats,)
        mut = jax.lax.fori_loop(max_depth - deepest, max_depth, backup_level, mut0)
        if use_bias:
            tree = tree._replace(
                stats=mut[0],
                bias_table=mut[1],
                last_bias_delta=mut[2],
                last_bias_weight=mut[3],
            )
        else:
            tree = tree._replace(stats=mut[0])

        # --- root level (full width) ---
        root_mask = (limit >= 0) & act_mask
        rchild = tree.children[bidx, 0, act0]
        rok = rchild >= 0
        rrow = tree.stats[bidx, jnp.maximum(rchild, 0)]
        root_cs = root_cs_raw.at[bidx, act0].set(
            jnp.where(rok[:, None], rrow, root_cs_raw[bidx, act0])
        )
        tree = _recompute_node(cfg, sp, tree, zero, root_mask, cs_raw=root_cs)
    return tree, rng, level_stats, root_cs


def make_round_scratch(cfg, tree: Tree, max_depth: int, K: int) -> jax.Array:
    """Per-level save for the vectorized K-playout round: one row per
    (game, playout), same SC_* channel layout as make_sim_scratch."""
    B = tree.stats.shape[0]
    C = 4 * max(cfg.x_size, cfg.y_size)
    return jnp.zeros((B * K, max_depth + 1, C, SC_WIDTH), jnp.float32)


def _simulate_round(
    cfg, sp: SearchParams, eval_fn: EvalFn, tree: Tree, rng, max_depth: int, K: int,
    active: jax.Array | None = None,
    scratch: jax.Array | None = None,
    avoid_until: jax.Array | None = None,
    root_cs: jax.Array | None = None,
):
    """K playouts per game in one round — the lockstep analogue of the
    reference's numSearchThreads parallel playouts (searchparams.h:111,
    search.cpp:361-509: N threads on one tree, diversified by virtual
    losses), VECTORIZED: the K playouts fold into the batch dimension so a
    level costs ONE op set regardless of K (per-level cost on TPU is
    op-count-bound — round-5 phase split), and K playouts land per round,
    dividing the rounds per move by ~K.

    Diversification semantics (documented TPU-native variant of the
    reference's virtual losses): ROOT selection is sequenced — playout k
    sees the in-flight root edge visits of playouts before it, the
    virtual-visit analogue that spreads the K playouts over different root
    children. Below the root the playouts descend independently with no
    intra-level visibility; because Coffee's DAG is graded by stone count,
    two playouts can only meet at the same node AT THE SAME LEVEL, where
    they then duplicate (the reference's virtual loss would instead split
    them). Expansions apply sequentially (later playouts link to nodes
    allocated earlier in the round, including same-edge collisions); the
    union backup recomputes each distinct path node once per level with the
    combined visit count, every changed lane patched from fresh reads.

    `active` [B, K] masks playout slots (visit-target searches hand out only
    the remaining deficit). Returns (tree, rng, scratch)."""
    B, N_ = tree.stats.shape[:2]
    A2 = tree.prior.shape[-1]
    C_ = 4 * max(cfg.x_size, cfg.y_size)
    BK = B * K
    bidx = jnp.arange(B)
    ridx = jnp.arange(BK)
    bidx2 = jnp.repeat(bidx, K)  # game index of row b*K+k
    k_leak, k_eval, rng = jax.random.split(rng, 3)
    act_mask = jnp.ones((B, K), bool) if active is None else active
    am_flat = act_mask.reshape(BK)
    D = max_depth
    zero = jnp.zeros((B,), jnp.int32)
    ones_b = jnp.ones((B,), bool)

    use_leak = sp.useGraphSearch and sp.graphSearchCatchUpLeakProb > 0.0
    if use_leak:
        u_leak = jax.random.uniform(jax.random.fold_in(k_leak, 1), (BK, D + 1))

    with jax.named_scope("ph_descent"):
        # ---- root level: K selections sequenced over in-flight visits ----
        root_term = tree.is_terminal[:, 0]
        root_cs_raw = (
            root_cs if root_cs is not None else _gather_child_stats(tree, bidx, zero)
        )  # [B, A, 8]  (carried across sims — see _simulate_once)
        ev_root = tree.edge_visits[:, 0]  # running row incl. virtual visits
        if avoid_until is not None:
            pidx0 = jnp.clip(tree.states.to_move[:, 0].astype(jnp.int32) - 1, 0, 1)
            forbid0 = avoid_until[bidx, pidx0] > 0
        else:
            forbid0 = None
        act0_l, node1_l, moveon_l, catch_l = [], [], [], []
        claimed = jnp.zeros((B, A2), jnp.float32)  # this round's prior claims
        for k in range(K):
            cs0 = _edge_stats_from_raw(
                tree, bidx, zero, root_cs_raw, evis_row=ev_root
            )
            if k > 0:
                # Virtual LOSSES for edges claimed by playouts earlier in
                # this round (searchparams.h numVirtualLossesPerThread;
                # searchnode virtual-loss weight): each claim adds weight 1
                # at the mover-loss utility, discouraging later playouts
                # from piling onto the same edge — including UNEXPANDED
                # edges, where plain in-flight edge visits carry no weight.
                w0 = cs0["w"]
                q0 = cs0["u"]
                wv = w0 + claimed
                qv = jnp.where(
                    claimed > 0,
                    (w0 * q0 - claimed * sp.winLossUtilityFactor)
                    / jnp.maximum(wv, _EPS),
                    q0,
                )
                cs0 = dict(
                    cs0, w=wv, u=qv, live=cs0["live"] | (claimed > 0),
                    force_w=w0,
                )
            a0 = _select_action(cfg, sp, tree, zero, ones_b, cs=cs0, forbid=forbid0)
            child0 = tree.children[bidx, 0, a0]
            has0 = child0 >= 0
            if sp.useGraphSearch:
                cvis0 = tree.stats[bidx, jnp.maximum(child0, 0), S_VISITS]
                wc0 = has0 & (ev_root[bidx, a0].astype(jnp.float32) < cvis0 - 0.5)
                if use_leak:
                    wc0 = wc0 & ~(
                        u_leak[bidx * K + k, 0] < sp.graphSearchCatchUpLeakProb
                    )
            else:
                wc0 = jnp.zeros((B,), bool)
            stop0 = root_term | wc0 | ~has0
            mo0 = ~stop0
            onehot_a0 = a0[:, None] == jnp.arange(A2)[None, :]
            ev_root = ev_root + (
                onehot_a0 & (mo0 & act_mask[:, k])[:, None]
            ).astype(jnp.int32)
            claimed = claimed + (onehot_a0 & act_mask[:, k][:, None]).astype(
                jnp.float32
            )
            act0_l.append(a0)
            node1_l.append(jnp.where(mo0, jnp.maximum(child0, 0), 0))
            moveon_l.append(mo0)
            catch_l.append(wc0 & ~root_term)
        act0 = jnp.stack(act0_l, axis=1)  # [B, K]
        node1 = jnp.stack(node1_l, axis=1)
        move_on0 = jnp.stack(moveon_l, axis=1)
        catch0 = jnp.stack(catch_l, axis=1)
        tree = tree._replace(
            edge_visits=tree.edge_visits.at[:, 0].set(ev_root)
        )

        # ---- interior levels: one vectorized op set over B*K rows ----
        node_f0 = node1.reshape(BK)
        mo_f0 = move_on0.reshape(BK)
        depth_f0 = mo_f0.astype(jnp.int32)
        active_f0 = mo_f0 & (1 < D)
        path0 = jnp.full((BK, D + 1), -1, jnp.int32).at[:, 0].set(0)
        path0 = path0.at[:, 1].set(jnp.where(mo_f0, node_f0, path0[:, 1]))
        acts_c0 = jnp.zeros((BK, D + 1), jnp.int32)
        acts_f0 = jnp.zeros((BK, D + 1), jnp.int32).at[:, 0].set(act0.reshape(BK))

        def cond(carry):
            return jnp.any(carry[2])

        def body(carry):
            node, depth, active_, path, acts_c, acts_f, catch, ev, it, save = carry
            term = tree.is_terminal[bidx2, node]
            cand, valid = _cand_lanes(cfg, tree.states, bidx2, node)  # [BK, C]
            oh = (
                (cand[:, :, None] == jnp.arange(A2)[None, None, :])
                & valid[:, :, None]
            ).astype(jnp.float32)
            ev_row = ev[bidx2, node]
            rows = [
                tree.children[bidx2, node].astype(jnp.float32),
                ev_row.astype(jnp.float32),
                tree.prior[bidx2, node],
            ]
            if sp.useNoisePruning:
                rows.append(tree.policy_rank[bidx2, node].astype(jnp.float32))
            comp = jnp.einsum(
                "bca,bas->bcs", oh, jnp.stack(rows, axis=-1), precision=_HIGHEST
            )
            child_c_f = comp[..., 0]
            child_c = jnp.where(valid, child_c_f.astype(jnp.int32), -1)
            ev_c = comp[..., 1]
            prior_c = jnp.where(valid, comp[..., 2], -1.0)
            if sp.useNoisePruning:
                rank_c = jnp.where(valid, comp[..., 3], 1e6)
            else:
                rank_c = jnp.zeros_like(ev_c)
            has_c = child_c >= 0
            cidx_c = jnp.maximum(child_c, 0)
            with jax.named_scope("ph_gather"):
                onehot_n = (
                    jax.nn.one_hot(cidx_c, N_, dtype=jnp.float32)
                    * has_c[..., None]
                ).reshape(B, K, C_, N_)
                cs_raw = jnp.einsum("bkcn,bns->bkcs", onehot_n, tree.stats).reshape(
                    BK, C_, NUM_STATS
                )
            lvl = jnp.concatenate(
                [
                    cs_raw,
                    prior_c[..., None], rank_c[..., None],
                    child_c_f[..., None], ev_c[..., None],
                ],
                axis=-1,
            )
            save = jax.lax.dynamic_update_index_in_dim(save, lvl, it, 1)

            cs = _edge_stats_from_raw(
                tree, bidx2, node, cs_raw, child_row=child_c, evis_row=ev_c
            )
            if avoid_until is not None:
                pidx = jnp.clip(
                    tree.states.to_move[bidx2, node].astype(jnp.int32) - 1, 0, 1
                )
                forbid_c = _compact_row(oh, avoid_until[bidx2, pidx]) > depth[:, None]
            else:
                forbid_c = None
            act_c = _select_action_compact(
                sp, prior_c, cs,
                tree.stats[bidx2, node], tree.self_stats[bidx2, node, F_U], forbid_c,
            )
            child = child_c[ridx, act_c]
            has_child = child >= 0
            cidx = jnp.maximum(child, 0)
            flat_act = cand[ridx, act_c]
            if sp.useGraphSearch:
                cvis = tree.stats[bidx2, cidx, S_VISITS]
                want_catch = has_child & (ev_c[ridx, act_c] < cvis - 0.5)
                if use_leak:
                    want_catch = want_catch & ~(
                        u_leak[ridx, jnp.minimum(depth, D)]
                        < sp.graphSearchCatchUpLeakProb
                    )
            else:
                want_catch = jnp.zeros((BK,), bool)

            stop = term | want_catch | ~has_child
            move_on = active_ & ~stop
            rec = active_ & ~term
            slot = jnp.where(rec, depth, D)
            acts_c = acts_c.at[ridx, slot].set(jnp.where(rec, act_c, acts_c[:, D]))
            acts_f = acts_f.at[ridx, slot].set(jnp.where(rec, flat_act, acts_f[:, D]))
            inc_row = (
                (flat_act[:, None] == jnp.arange(A2)[None, :])
                & (move_on & am_flat)[:, None]
            ).astype(jnp.int32)
            # scatter-ADD (not a row RMW): two playouts of the same game can
            # update the same node row this level; duplicate adds must sum
            ev = ev.at[bidx2, node].add(inc_row)
            new_node = jnp.where(move_on, cidx, node)
            new_depth = jnp.where(move_on, depth + 1, depth)
            path = path.at[ridx, jnp.where(move_on, new_depth, 0)].set(
                jnp.where(move_on, new_node, path[:, 0])
            )
            catch = catch | (active_ & want_catch & ~term)
            new_active = move_on & (new_depth < D)
            return (
                new_node, new_depth, new_active, path, acts_c, acts_f, catch,
                ev, it + 1, save,
            )

        save0 = scratch if scratch is not None else make_round_scratch(cfg, tree, D, K)
        (
            leaf_f, leaf_depth_f, _, path, acts_c, acts_f, caught_f, ev_out, _,
            level_stats,
        ) = jax.lax.while_loop(
            cond,
            body,
            (
                node_f0, depth_f0, active_f0, path0, acts_c0, acts_f0,
                catch0.reshape(BK), tree.edge_visits, jnp.asarray(0, jnp.int32),
                save0,
            ),
        )
    tree = tree._replace(edge_visits=ev_out)
    leaf = leaf_f.reshape(B, K)
    leaf_depth = leaf_depth_f.reshape(B, K)
    action = jnp.clip(acts_f[ridx, leaf_depth_f], 0, A2 - 1).reshape(B, K)

    caught = caught_f.reshape(B, K) & act_mask
    leaf_terminal = tree.is_terminal[bidx[:, None], leaf] & act_mask

    # ---------------- One batched eval for all K leaves ----------------
    leaf_states = jax.tree_util.tree_map(
        lambda x: x[bidx[:, None], leaf].reshape((B * K,) + x.shape[2:]),
        tree.states,
    )
    new_states_flat = jax.vmap(functools.partial(step, cfg))(
        leaf_states, action.reshape(B * K)
    )
    with jax.named_scope("ph_nneval"):
        res_flat = eval_fn(new_states_flat, k_eval)

    def slice_k(x, k):
        return x.reshape((B, K) + x.shape[1:])[:, k]

    use_bias = sp.subtreeValueBiasFactor != 0.0
    revisits = []
    for k in range(K):
        new_states = jax.tree_util.tree_map(
            functools.partial(slice_k, k=k), new_states_flat
        )
        res = EvalResult(
            *(None if x is None else slice_k(x, k) for x in res_flat)
        )
        leaf_k = leaf[:, k]
        action_k = action[:, k]
        caught_k = caught[:, k]
        mask_k = act_mask[:, k]
        term_leaf_k = leaf_terminal[:, k]
        expanding = ~tree.is_terminal[bidx, leaf_k] & ~caught_k & mask_k

        # a playout earlier in this round may have created this very child
        child_now = tree.children[bidx, leaf_k, action_k]
        has_now = child_now >= 0

        if sp.useGraphSearch:
            new_hash = jax.vmap(functools.partial(situation_hash, cfg))(new_states)
            slot_valid = (
                jnp.arange(tree.stats.shape[1])[None, :] < tree.node_count[:, None]
            )
            hmatch = slot_valid & (tree.sit_hash == new_hash[:, None, :]).all(-1)
            hfound = hmatch.any(axis=1)
            hidx = jnp.argmax(hmatch, axis=1)
        else:
            new_hash = None
            hfound = jnp.zeros((B,), bool)
            hidx = jnp.zeros((B,), jnp.int32)
        found = (hfound | has_now) & expanding
        found_idx = jnp.where(has_now, child_now, hidx)

        new_idx = tree.node_count
        capacity_ok = new_idx < tree.stats.shape[1]
        do_alloc = expanding & ~found & capacity_ok
        do_link = expanding & found
        overflow = expanding & ~found & ~capacity_ok

        new_terminal = new_states.done
        term_util = _terminal_utility(new_states)
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(new_states)
        new_prior = jnp.where(legal, _blend_policy(res, sp.policyOptimism), -1.0)
        u_raw = jnp.where(new_terminal, term_util, res.utility)
        wl_new = jnp.where(new_terminal, term_util, res.wl)
        d_new = jnp.where(
            new_terminal, (new_states.winner == 0).astype(jnp.float32), res.draw
        )
        w_new = jnp.where(new_terminal, 1.0, _eval_weight(sp, res.shortterm_error))

        if use_bias:
            new_keys = _bias_keys(cfg, new_states)
            u_init = u_raw + jnp.where(
                new_terminal, 0.0, _bias_avg(sp, tree, bidx, new_keys)
            )
        else:
            new_keys = jnp.zeros((B,), jnp.int32)
            u_init = u_raw

        slot = jnp.where(do_alloc, new_idx, 0)

        def upd(arr, val, do_alloc=do_alloc, slot=slot):
            old = arr[bidx, slot]
            return arr.at[bidx, slot].set(jnp.where(do_alloc, val, old))

        def upd_row(arr, val, do_alloc=do_alloc, slot=slot):
            old = arr[bidx, slot]
            return arr.at[bidx, slot].set(jnp.where(do_alloc[:, None], val, old))

        sit_hash = (
            upd_row(tree.sit_hash, new_hash) if sp.useGraphSearch else tree.sit_hash
        )

        one = jnp.ones((B,), jnp.float32)
        new_stats_row = _stats_row(
            one, w_new, w_new * w_new, u_init, u_init * u_init, wl_new, d_new
        )
        new_self_row = jnp.stack([u_raw, wl_new, d_new, w_new], axis=-1)

        new_child_idx = jnp.where(do_link, found_idx, new_idx)
        tree = tree._replace(
            states=jax.tree_util.tree_map(
                lambda full, new: full.at[bidx, slot].set(
                    jnp.where(
                        jnp.reshape(do_alloc, (B,) + (1,) * (new.ndim - 1)),
                        new,
                        full[bidx, slot],
                    )
                ),
                tree.states,
                new_states,
            ),
            stats=upd_row(tree.stats, new_stats_row),
            self_stats=upd_row(tree.self_stats, new_self_row),
            prior=upd_row(tree.prior, new_prior),
            policy_rank=(
                tree.policy_rank.at[bidx, slot].set(
                    jnp.where(
                        do_alloc[:, None],
                        _policy_ranks(new_prior),
                        tree.policy_rank[bidx, slot],
                    )
                )
                if sp.useNoisePruning
                else tree.policy_rank
            ),
            parent=upd(tree.parent, leaf_k),
            parent_action=upd(tree.parent_action, action_k),
            is_terminal=upd(tree.is_terminal, new_terminal),
            sit_hash=sit_hash,
            bias_key=upd(tree.bias_key, new_keys) if use_bias else tree.bias_key,
            children=tree.children.at[bidx, leaf_k].set(
                jnp.where(
                    (action_k[:, None] == jnp.arange(tree.prior.shape[-1])[None, :])
                    & (do_alloc | do_link)[:, None],
                    new_child_idx[:, None],
                    tree.children[bidx, leaf_k],
                )
            ),
            node_count=tree.node_count + do_alloc.astype(jnp.int32),
        )

        edge_inc = (do_alloc | do_link | caught_k).astype(jnp.int32)
        tree = tree._replace(
            edge_visits=tree.edge_visits.at[bidx, leaf_k].set(
                tree.edge_visits[bidx, leaf_k]
                + (action_k[:, None] == jnp.arange(tree.prior.shape[-1])[None, :]).astype(jnp.int32)
                * edge_inc[:, None]
            )
        )

        revisit = term_leaf_k | overflow
        leaf_row = tree.stats[bidx, leaf_k]
        leaf_self = tree.self_stats[bidx, leaf_k]
        lw = leaf_self[:, F_W]
        old_ws = leaf_row[:, S_W]
        new_ws = old_ws + lw
        inv = 1.0 / jnp.maximum(new_ws, _EPS)
        lu = leaf_self[:, F_U]
        revisit_row = _stats_row(
            leaf_row[:, S_VISITS] + 1.0,
            new_ws,
            leaf_row[:, S_WSQ] + lw * lw,
            (leaf_row[:, S_U] * old_ws + lu * lw) * inv,
            (leaf_row[:, S_USQ] * old_ws + lu * lu * lw) * inv,
            (leaf_row[:, S_WL] * old_ws + leaf_self[:, F_WL] * lw) * inv,
            (leaf_row[:, S_DRAW] * old_ws + leaf_self[:, F_DRAW] * lw) * inv,
        )
        tree = tree._replace(
            stats=tree.stats.at[bidx, leaf_k].set(
                jnp.where(revisit[:, None], revisit_row, leaf_row)
            )
        )
        revisits.append(revisit)

    revisit = jnp.stack(revisits, axis=1)  # [B, K]

    # ---------------- Union backup (vectorized over B*K rows) ----------------
    # Bottom-up over interior levels; each distinct path node is recomputed
    # ONCE (first-playout-wins; losers' rows are masked AND redirected to an
    # out-of-bounds node so their scatter writes drop) with the combined
    # visit count. Every lane some playout changed at the node is patched
    # with FRESH element reads (child link / edge visits / child stats) —
    # cheap [B]-wide gathers, K^2 patch groups. The root level runs once,
    # full-width, after the loop.
    with jax.named_scope("ph_backup"):
        limit = jnp.where(revisit, leaf_depth - 1, leaf_depth)  # [B, K]
        limit_f = limit.reshape(BK)
        leafd_f = leaf_depth.reshape(BK)

        def backup_level(i, mut):
            if use_bias:
                tr = tree._replace(
                    stats=mut[0],
                    bias_table=mut[1],
                    last_bias_delta=mut[2],
                    last_bias_weight=mut[3],
                )
            else:
                tr = tree._replace(stats=mut[0])
            l = D - i  # interior level >= 1
            lc = jnp.minimum(l, D)
            nodes_f = path[:, lc]  # [BK]
            on_path_f = (l <= limit_f) & (nodes_f >= 0) & (l <= leafd_f) & am_flat
            sv = jax.lax.dynamic_index_in_dim(level_stats, lc - 1, 1, keepdims=False)
            cs_raw = sv[..., :NUM_STATS].reshape(B, K, C_, NUM_STATS)
            prior_c = sv[..., SC_PRIOR]
            rank_c = sv[..., SC_RANK]
            child_c = sv[..., SC_CHILD].astype(jnp.int32).reshape(B, K, C_)
            ev_c = sv[..., SC_EV].reshape(B, K, C_)
            nodes = nodes_f.reshape(B, K)
            on_path = on_path_f.reshape(B, K)
            pa_c = acts_c[:, lc].reshape(B, K)
            pa_f = acts_f[:, lc].reshape(B, K)
            for k in range(K):
                n_k = nodes[:, k]
                for j in range(K):
                    same = on_path[:, j] & (nodes[:, j] == n_k)
                    lane = pa_c[:, j]
                    fa = jnp.clip(pa_f[:, j], 0, A2 - 1)
                    fresh_child = tr.children[bidx, n_k, fa]
                    fresh_ev = tr.edge_visits[bidx, n_k, fa].astype(jnp.float32)
                    okc = same & (fresh_child >= 0)
                    prow = tr.stats[bidx, jnp.maximum(fresh_child, 0)]
                    child_c = child_c.at[bidx, k, lane].set(
                        jnp.where(same, fresh_child, child_c[bidx, k, lane])
                    )
                    ev_c = ev_c.at[bidx, k, lane].set(
                        jnp.where(same, fresh_ev, ev_c[bidx, k, lane])
                    )
                    cs_raw = cs_raw.at[bidx, k, lane].set(
                        jnp.where(okc[:, None], prow, cs_raw[bidx, k, lane])
                    )
            # first-playout-wins dedup + combined visit counts
            dup = jnp.zeros((B, K), bool)
            cnt = on_path.astype(jnp.float32)
            for k in range(K):
                for j in range(K):
                    if j == k:
                        continue
                    same = on_path[:, j] & (nodes[:, j] == nodes[:, k])
                    if j < k:
                        dup = dup.at[:, k].set(dup[:, k] | same)
                    else:
                        cnt = cnt.at[:, k].add(same.astype(jnp.float32))
            rm = on_path & ~dup
            node_w = jnp.where(rm, nodes, N_)  # OOB: losers' writes drop
            tr = _recompute_node(
                cfg, sp, tr, node_w.reshape(BK), rm.reshape(BK),
                cs_raw=cs_raw.reshape(BK, C_, NUM_STATS),
                visit_inc=cnt.reshape(BK),
                lanes=dict(
                    child_row=child_c.reshape(BK, C_),
                    evis_row=ev_c.reshape(BK, C_),
                    prior_row=prior_c, rank_row=rank_c,
                ),
                bidx=bidx2,
            )
            if use_bias:
                return (tr.stats, tr.bias_table, tr.last_bias_delta, tr.last_bias_weight)
            return (tr.stats,)

        deepest = jnp.max(jnp.where(act_mask, limit, 0))
        if use_bias:
            mut0 = (tree.stats, tree.bias_table, tree.last_bias_delta, tree.last_bias_weight)
        else:
            mut0 = (tree.stats,)
        mut = jax.lax.fori_loop(D - deepest, D, backup_level, mut0)
        if use_bias:
            tree = tree._replace(
                stats=mut[0],
                bias_table=mut[1],
                last_bias_delta=mut[2],
                last_bias_weight=mut[3],
            )
        else:
            tree = tree._replace(stats=mut[0])

        # ---- root level (full width, once, combined count) ----
        root_on = (limit >= 0) & act_mask  # [B, K]
        root_mask = root_on.any(-1)
        rcount = root_on.sum(-1).astype(jnp.float32)
        root_cs = root_cs_raw
        for k in range(K):
            a0 = act0[:, k]
            rchild = tree.children[bidx, 0, a0]
            rok = root_on[:, k] & (rchild >= 0)
            rrow = tree.stats[bidx, jnp.maximum(rchild, 0)]
            root_cs = root_cs.at[bidx, a0].set(
                jnp.where(rok[:, None], rrow, root_cs[bidx, a0])
            )
        tree = _recompute_node(
            cfg, sp, tree, zero, root_mask, cs_raw=root_cs, visit_inc=rcount
        )
    return tree, rng, level_stats, root_cs


def _norm_cdf(z):
    return 0.5 * (1.0 + jax.lax.erf(z / jnp.sqrt(2.0)))


@jax.named_scope("ph_recompute")
def _recompute_node(
    cfg, sp: SearchParams, tree: Tree, node: jax.Array, mask: jax.Array, cs_raw=None,
    visit_inc: jax.Array | float = 1.0, lanes: dict | None = None,
    bidx: jax.Array | None = None,
):
    """recomputeNodeStats for [B] nodes (searchupdatehelpers.cpp:152-337):
    aggregate child edges with noise pruning + value-based downweighting,
    update the subtree-value-bias entry, and add the node's (biased) direct
    eval. One packed row write per node. `cs_raw` [B, A', 8] optionally
    supplies the children's raw stat rows (skips the einsum gather);
    `visit_inc` [B] is how many playouts traversed the node this round.
    `lanes` optionally supplies compact [B,C] action-lane views
    (child_row/evis_row/prior_row/rank_row, from the descent's save buffer)
    — the aggregation is lane-width agnostic, so running it on the ~4x
    smaller interior-node lane set is exact (every legal action of an
    interior node is on its last-move line).
    `bidx` optionally maps each row to its game (default arange: one row
    per game). With duplicate (bidx, node) pairs the caller must mask all
    but one row AND redirect the masked rows' node to an out-of-bounds
    index (scatter updates there are dropped) — a masked row still WRITES
    its old row back, and scatter order between duplicates is undefined."""
    B = node.shape[0]
    bidx = jnp.arange(B) if bidx is None else bidx
    is_root = node == 0

    if cs_raw is None:
        cs_raw = _gather_child_stats(tree, bidx, node)
    cs = _edge_stats_from_raw(
        tree, bidx, node, cs_raw,
        child_row=None if lanes is None else lanes["child_row"],
        evis_row=None if lanes is None else lanes["evis_row"],
    )
    cw, cu, cwl, cdraw, cusq, cwsq = (
        cs["w"], cs["u"], cs["wl"], cs["draw"], cs["usq"], cs["wsq"],
    )
    orig_total = cw.sum(-1)

    # --- noise pruning (pruneNoiseWeight, vectorized approximation) ---
    if sp.useNoisePruning:
        raw_prior = jnp.maximum(
            tree.prior[bidx, node] if lanes is None else lanes["prior_row"], 1e-30
        )
        # [B, A'] rank positions; only the relative order matters, so ranks
        # restricted to the compact lane subset are exact
        rank = tree.policy_rank[bidx, node] if lanes is None else lanes["rank_row"]
        # Exclusive prefix sums in policy-descending order WITHOUT physically
        # permuting: predecessor mask lt[b, a', a] = (rank[a'] < rank[a]),
        # then one [B,A,3] @ [B,A',A] contraction on the MXU gives all three
        # running sums in original action order. The previous formulation's
        # two take_along_axis permutes serialized on TPU (~400µs/backup
        # level combined — 24%% of whole-search time, profiled).
        lt = (rank[:, :, None] < rank[:, None, :]).astype(jnp.float32)
        pk = jnp.stack([cw, cw * cu, raw_prior], axis=-1)  # [B, A', 3]
        cums = jnp.einsum("bas,bac->bcs", pk, lt)  # [B, A, 3]
        cum_w, cum_uw, cum_p = cums[..., 0], cums[..., 1], cums[..., 2]
        avg_so_far = cum_uw / jnp.maximum(cum_w, _EPS)
        gap = avg_so_far - cu
        share = cum_w * raw_prior / jnp.maximum(cum_p, 1e-30)
        excess = jnp.maximum(cw - 2.0 * share, 0.0)
        sub = jnp.where(
            (gap > 0) & (cum_w > 0),
            excess * (1.0 - jnp.exp(-gap / sp.noisePruneUtilityScale)),
            0.0,
        )
        if sp.noisePruningCap < 1e30:  # default 1e50 = uncapped (f32-safe)
            sub = jnp.minimum(sub, sp.noisePruningCap)
        cw_used = cw - sub
    else:
        cw_used = cw

    # --- root noise subtraction when not noise-pruning ---
    # (searchupdatehelpers.cpp:199-209)
    if sp.rootNoiseEnabled and not sp.useNoisePruning and (
        sp.chosenMoveSubtract > 0 or sp.chosenMovePrune > 0
    ):
        max_w = cw_used.max(-1)
        subtract = jnp.minimum(sp.chosenMoveSubtract, max_w / 64.0)
        prune = jnp.minimum(sp.chosenMovePrune, max_w / 64.0)
        at_root = is_root[:, None]
        w_adj0 = jnp.maximum(cw_used - subtract[:, None], 0.0)
        w_adj0 = jnp.where(cw_used < prune[:, None], 0.0, w_adj0)
        cw_used = jnp.where(at_root, w_adj0, cw_used)

    total_w = cw_used.sum(-1)

    if sp.valueWeightExponent > 0:
        # downweightBadChildrenAndNormalizeWeight (searchupdatehelpers.cpp:368+)
        simple_value = jnp.where(
            total_w > 0, (cu * cw_used).sum(-1) / jnp.maximum(total_w, _EPS), 0.0
        )
        precision = 1.5 * jnp.sqrt(jnp.maximum(cw_used, _EPS))
        stdev = jnp.sqrt(1e-8 + 1.0 / precision)
        z = (cu - simple_value[:, None]) / stdev
        p = _norm_cdf(z) + 1e-4
        w_adj = cw_used * jnp.power(p, sp.valueWeightExponent)
        w_adj_sum = w_adj.sum(-1)
        factor = jnp.where(w_adj_sum > 0, total_w / jnp.maximum(w_adj_sum, _EPS), 0.0)
        w_adj = w_adj * factor[:, None]
    else:
        w_adj = cw_used

    scaling = jnp.where(cw > 0, w_adj / jnp.maximum(cw, _EPS), 0.0)

    selfs = tree.self_stats[bidx, node]  # [B, 4]
    self_w = selfs[:, F_W]
    self_u_raw = selfs[:, F_U]

    child_w_total = w_adj.sum(-1)
    util_children_sum = (w_adj * cu).sum(-1)

    # --- subtree value bias (searchupdatehelpers.cpp:254-285) ---
    if sp.subtreeValueBiasFactor != 0.0:
        key = tree.bias_key[bidx, node]
        has_children = orig_total > 1e-10
        util_children = util_children_sum / jnp.maximum(child_w_total, _EPS)
        w_b = jnp.power(jnp.maximum(orig_total, 0.0), sp.subtreeValueBiasWeightExponent)
        delta = (util_children - self_u_raw) * w_b
        do_upd = mask & has_children
        d_delta = jnp.where(do_upd, delta - tree.last_bias_delta[bidx, node], 0.0)
        d_weight = jnp.where(do_upd, w_b - tree.last_bias_weight[bidx, node], 0.0)
        bias_table = tree.bias_table.at[bidx, key].add(
            jnp.stack([d_delta, d_weight], axis=-1)
        )
        tree = tree._replace(
            bias_table=bias_table,
            last_bias_delta=tree.last_bias_delta.at[bidx, node].set(
                jnp.where(do_upd, delta, tree.last_bias_delta[bidx, node])
            ),
            last_bias_weight=tree.last_bias_weight.at[bidx, node].set(
                jnp.where(do_upd, w_b, tree.last_bias_weight[bidx, node])
            ),
        )
        entry = bias_table[bidx, key]
        bias = jnp.where(
            entry[:, 1] > 0.001,
            sp.subtreeValueBiasFactor * entry[:, 0] / jnp.maximum(entry[:, 1], 1e-9),
            0.0,
        )
        self_u = self_u_raw + jnp.where(tree.is_terminal[bidx, node], 0.0, bias)
    else:
        self_u = self_u_raw

    weight_sum = child_w_total + self_w
    inv = 1.0 / jnp.maximum(weight_sum, _EPS)
    old_row = tree.stats[bidx, node]
    new_row = _stats_row(
        old_row[:, S_VISITS] + visit_inc,
        weight_sum,
        (scaling * scaling * cwsq).sum(-1) + self_w * self_w,
        (util_children_sum + self_w * self_u) * inv,
        ((w_adj * cusq).sum(-1) + self_w * self_u * self_u) * inv,
        ((w_adj * cwl).sum(-1) + self_w * selfs[:, F_WL]) * inv,
        ((w_adj * cdraw).sum(-1) + self_w * selfs[:, F_DRAW]) * inv,
    )
    return tree._replace(
        stats=tree.stats.at[bidx, node].set(
            jnp.where(mask[:, None], new_row, old_row)
        )
    )


# ---------------------------------------------------------------------------
# Whole search
# ---------------------------------------------------------------------------


def run_search(
    cfg: GameConfig,
    sp: SearchParams,
    eval_fn: EvalFn,
    root_states: GameState,
    num_sims: int,
    rng: jax.Array,
    max_nodes: int | None = None,
    reuse_tree: Tree | None = None,
    reuse_actions: jax.Array | None = None,
    reuse_ok: jax.Array | None = None,
    root_hint: jax.Array | None = None,
    root_avoid: jax.Array | None = None,
    avoid_until: jax.Array | None = None,
    with_diag: bool = False,
) -> Tree:
    """runWholeSearch equivalent (search.cpp:361-509): playouts for each of
    the B games, fully on device. jit this (closing over cfg/sp/eval_fn/
    num_sims). `avoid_until` [B,2,A] int32 applies the reference's
    depth-limited avoidMoveUntilByLoc gating during descent (see
    _simulate_once; `root_avoid` covers depth 0 via the root prior).

    Without reuse: exactly num_sims playouts (root ends at num_sims+1
    visits). With `reuse_tree` (the previous move's tree), `reuse_actions`
    (the move each game played), and `reuse_ok` ([B] — False where the game
    reset or reuse is otherwise invalid): the tree is re-rooted at the played
    child (the reference's beginSearch tree reuse, search.cpp:262-331) and
    playouts run only until every root reaches num_sims+1 total visits —
    reused visits count toward the budget exactly as the reference's
    maxVisits does, which is where tree reuse saves compute.

    `with_diag=True` additionally returns a dict of search-accounting
    counters (the NNEvaluator stats role, nneval.h:171-176): `rounds` —
    scalar int32, number of simulate rounds executed (each round submits ONE
    batched NN forward of B rows, active or not — lockstep); and
    `start_visits` — [B] f32 root visits already present when playouts began
    (1 for a fresh tree; the reused subtree's visits under tree reuse), from
    which per-game deficits and batch occupancy follow."""
    if max_nodes is None:
        max_nodes = num_sims + 2
    # Descent depth bound. With graph search, a playout truncated by the
    # bound stops at an existing child, hash-matches it in expansion, and
    # claims one edge visit — the same bookkeeping as edge-visit catch-up,
    # so a finite cap is a soft truncation, not an error. The lockstep
    # descent runs max-over-batch levels per round, so a cap trims the
    # deep-tail levels every game pays for (maxPlayoutDepthProp below 1
    # trades bounded deep-line growth for wall time; quality-validate before
    # lowering it in selfplay).
    max_depth = cfg.area + 1
    if sp.useGraphSearch and sp.maxPlayoutDepthProp < 1.0:
        max_depth = max(2, min(max_depth, int(round(max_depth * sp.maxPlayoutDepthProp))))
    k_init, k_sims = jax.random.split(rng)

    K = max(1, int(sp.numSearchThreads))
    if K > 1 and sp.useGraphSearch and sp.maxPlayoutDepthProp < 1.0:
        raise NotImplementedError(
            "maxPlayoutDepthProp < 1 requires numSearchThreads == 1"
        )

    if reuse_tree is None:
        tree = init_tree(
            cfg, sp, eval_fn, root_states, max_nodes, k_init, root_hint=root_hint,
            root_avoid=root_avoid,
        )

        if K > 1:
            scratch0 = make_round_scratch(cfg, tree, max_depth, K)
            rcs0 = _gather_child_stats(
                tree, jnp.arange(tree.stats.shape[0]),
                jnp.zeros((tree.stats.shape[0],), jnp.int32),
            )
            rounds = -(-num_sims // K)

            def body(r, carry):
                tree, rng, scratch, rcs = carry
                k, rng = jax.random.split(rng)
                B = tree.stats.shape[0]
                # last round hands out only the remainder of the budget
                slot = r * K + jnp.arange(K)[None, :]
                active = jnp.broadcast_to(slot < num_sims, (B, K))
                tree, _, scratch, rcs = _simulate_round(
                    cfg, sp, eval_fn, tree, k, max_depth, K,
                    active=active, scratch=scratch, avoid_until=avoid_until,
                    root_cs=rcs,
                )
                return tree, rng, scratch, rcs

            tree, _, _, _ = jax.lax.fori_loop(
                0, rounds, body, (tree, k_sims, scratch0, rcs0)
            )
            if with_diag:
                B = tree.stats.shape[0]
                return tree, {
                    "rounds": jnp.asarray(rounds, jnp.int32),
                    "start_visits": jnp.ones((B,), jnp.float32),
                }
            return tree

        scratch0 = make_sim_scratch(cfg, tree, max_depth)
        rcs0 = _gather_child_stats(
            tree, jnp.arange(tree.stats.shape[0]),
            jnp.zeros((tree.stats.shape[0],), jnp.int32),
        )

        def body(_, carry):
            tree, rng, scratch, rcs = carry
            k, rng = jax.random.split(rng)
            tree, _, scratch, rcs = _simulate_once(
                cfg, sp, eval_fn, tree, k, max_depth, scratch=scratch,
                avoid_until=avoid_until, root_cs=rcs,
            )
            return tree, rng, scratch, rcs

        tree, _, _, _ = jax.lax.fori_loop(
            0, num_sims, body, (tree, k_sims, scratch0, rcs0)
        )
        if with_diag:
            B = tree.stats.shape[0]
            return tree, {
                "rounds": jnp.asarray(num_sims, jnp.int32),
                "start_visits": jnp.ones((B,), jnp.float32),
            }
        return tree

    tree = advance_root(
        cfg, sp, eval_fn, reuse_tree, reuse_actions, root_states, k_init,
        reuse_ok=reuse_ok, root_hint=root_hint, root_avoid=root_avoid,
    )
    target = float(num_sims + 1)
    start_visits = tree.stats[:, 0, S_VISITS]

    if K > 1:
        scratch0 = make_round_scratch(cfg, tree, max_depth, K)
        rcs0 = _gather_child_stats(
            tree, jnp.arange(tree.stats.shape[0]),
            jnp.zeros((tree.stats.shape[0],), jnp.int32),
        )

        def cond(carry):
            tree, rng, it, scratch, rcs = carry
            return (it < num_sims) & jnp.any(tree.stats[:, 0, S_VISITS] < target)

        def body(carry):
            tree, rng, it, scratch, rcs = carry
            k, rng = jax.random.split(rng)
            # hand each game only its remaining visit deficit in slots
            deficit = target - tree.stats[:, 0, S_VISITS]
            active = jnp.arange(K)[None, :] < deficit[:, None]
            tree, _, scratch, rcs = _simulate_round(
                cfg, sp, eval_fn, tree, k, max_depth, K,
                active=active, scratch=scratch, avoid_until=avoid_until,
                root_cs=rcs,
            )
            return tree, rng, it + 1, scratch, rcs

        tree, _, it, _, _ = jax.lax.while_loop(
            cond, body, (tree, k_sims, jnp.asarray(0, jnp.int32), scratch0, rcs0)
        )
        if with_diag:
            return tree, {"rounds": it, "start_visits": start_visits}
        return tree

    scratch0 = make_sim_scratch(cfg, tree, max_depth)
    rcs0 = _gather_child_stats(
        tree, jnp.arange(tree.stats.shape[0]),
        jnp.zeros((tree.stats.shape[0],), jnp.int32),
    )

    def cond(carry):
        tree, rng, it, scratch, rcs = carry
        return (it < num_sims) & jnp.any(tree.stats[:, 0, S_VISITS] < target)

    def body(carry):
        tree, rng, it, scratch, rcs = carry
        k, rng = jax.random.split(rng)
        active = tree.stats[:, 0, S_VISITS] < target
        tree, _, scratch, rcs = _simulate_once(
            cfg, sp, eval_fn, tree, k, max_depth, active=active, scratch=scratch,
            avoid_until=avoid_until, root_cs=rcs,
        )
        return tree, rng, it + 1, scratch, rcs

    tree, _, it, _, _ = jax.lax.while_loop(
        cond, body, (tree, k_sims, jnp.asarray(0, jnp.int32), scratch0, rcs0)
    )
    if with_diag:
        return tree, {"rounds": it, "start_visits": start_visits}
    return tree


def continue_search(
    cfg: GameConfig,
    sp: SearchParams,
    eval_fn: EvalFn,
    tree: Tree,
    max_more_sims: int,
    rng: jax.Array,
    target_visits: jax.Array | float,
    avoid_until: jax.Array | None = None,
) -> Tree:
    """Continue an existing search at the SAME root until each game's root
    reaches `target_visits` total visits (dynamic, scalar or [B]), bounded by
    `max_more_sims` additional playouts (static). This is the interruptible
    half of the reference's search loop (runWholeSearch's shouldStop polling,
    search.cpp:404-460): the host checks time/futility/streaming conditions
    between chunks while the chunks themselves stay compiled. Because
    `target_visits` is traced, ONE compilation serves every budget up to the
    static bound. The tree must have been allocated with enough node capacity
    for the final target (run_search's `max_nodes`)."""
    max_depth = cfg.area + 1
    if sp.useGraphSearch and sp.maxPlayoutDepthProp < 1.0:
        max_depth = max(2, min(max_depth, int(round(max_depth * sp.maxPlayoutDepthProp))))
    target = jnp.broadcast_to(
        jnp.asarray(target_visits, jnp.float32), (tree.stats.shape[0],)
    )

    K = max(1, int(sp.numSearchThreads))
    if K > 1:
        scratch0 = make_round_scratch(cfg, tree, max_depth, K)
        rcs0 = _gather_child_stats(
            tree, jnp.arange(tree.stats.shape[0]),
            jnp.zeros((tree.stats.shape[0],), jnp.int32),
        )

        def cond(carry):
            tree, rng, it, scratch, rcs = carry
            return (it < max_more_sims) & jnp.any(tree.stats[:, 0, S_VISITS] < target)

        def body(carry):
            tree, rng, it, scratch, rcs = carry
            k, rng = jax.random.split(rng)
            deficit = target - tree.stats[:, 0, S_VISITS]
            active = jnp.arange(K)[None, :] < deficit[:, None]
            tree, _, scratch, rcs = _simulate_round(
                cfg, sp, eval_fn, tree, k, max_depth, K,
                active=active, scratch=scratch, avoid_until=avoid_until,
                root_cs=rcs,
            )
            return tree, rng, it + 1, scratch, rcs

        tree, _, _, _, _ = jax.lax.while_loop(
            cond, body, (tree, rng, jnp.asarray(0, jnp.int32), scratch0, rcs0)
        )
        return tree

    scratch0 = make_sim_scratch(cfg, tree, max_depth)
    rcs0 = _gather_child_stats(
        tree, jnp.arange(tree.stats.shape[0]),
        jnp.zeros((tree.stats.shape[0],), jnp.int32),
    )

    def cond(carry):
        tree, rng, it, scratch, rcs = carry
        return (it < max_more_sims) & jnp.any(tree.stats[:, 0, S_VISITS] < target)

    def body(carry):
        tree, rng, it, scratch, rcs = carry
        k, rng = jax.random.split(rng)
        active = tree.stats[:, 0, S_VISITS] < target
        tree, _, scratch, rcs = _simulate_once(
            cfg, sp, eval_fn, tree, k, max_depth, active=active, scratch=scratch,
            avoid_until=avoid_until, root_cs=rcs,
        )
        return tree, rng, it + 1, scratch, rcs

    tree, _, _, _, _ = jax.lax.while_loop(
        cond, body, (tree, rng, jnp.asarray(0, jnp.int32), scratch0, rcs0)
    )
    return tree


@jax.named_scope("ph_reuse")
def advance_root(
    cfg: GameConfig,
    sp: SearchParams,
    eval_fn: EvalFn,
    tree: Tree,
    actions: jax.Array,
    root_states: GameState,
    rng: jax.Array,
    reuse_ok: jax.Array | None = None,
    turn_number: jax.Array | None = None,
    root_hint: jax.Array | None = None,
    root_avoid: jax.Array | None = None,
) -> Tree:
    """Re-root each game's tree at the child reached by `actions` —
    the reference's beginSearch tree reuse (search.cpp:262-331), as an array
    compaction: nodes reachable from the new root (by first-parent chains;
    under transpositions, nodes only reachable through non-first parents are
    conservatively dropped) are packed to the front with the new root at slot
    0; everything else is freed, subtracting freeProp of each freed node's
    subtree-value-bias contribution (removeSubtreeValueBias,
    search.cpp:773-786). Games where the played child does not exist, or
    where `reuse_ok` is False (e.g. the episode auto-reset), get a fresh
    root from a batched evaluation of `root_states`. Root priors are
    re-tempered/re-noised in both cases, as beginSearch does."""
    B, N = tree.stats.shape[:2]
    bidx = jnp.arange(B)
    nidx = jnp.arange(N)

    k_eval, k_noise1, k_noise2 = jax.random.split(rng, 3)
    res = _root_eval(cfg, sp, eval_fn, root_states, k_eval)
    fresh = _tree_from_root_eval(
        cfg, sp, root_states, res, N, k_noise1, turn_number, root_hint,
        root_avoid=root_avoid,
    )

    new_root = tree.children[bidx, 0, actions]  # [B]
    has = new_root >= 0
    if reuse_ok is not None:
        has = has & reuse_ok
    new_root_safe = jnp.maximum(new_root, 0)

    # Reachability from the new root via parent-pointer doubling. All
    # per-step lookups ride one-hot matmuls: [B,N]-indexed gathers serialize
    # on TPU (profiled: the gather formulation of this function cost ~1.6s
    # PER MOVE at the selfplay operating point, dominating the search
    # itself). 0/1 matmuls are exact in any precision; the pointer-value
    # matmul uses HIGHEST so integer node indices survive exactly.
    valid_slot = nidx[None, :] < tree.node_count[:, None]
    reach = (nidx[None, :] == new_root_safe[:, None]).astype(jnp.float32)
    ptr = tree.parent
    parent_f = tree.parent.astype(jnp.float32)
    # Doubling depth: parent CHAINS are bounded by game depth (the DAG is
    # graded by stone count, <= area+1 plies), not by node capacity N —
    # 2^steps must only cover the longest chain. 5 steps at 5x5 vs the 8
    # an N-derived bound costs (each step is ~4 [B,N,N] one-hot matmuls).
    steps = max(1, int(cfg.area + 1).bit_length())
    for _ in range(steps):
        ptr_safe = jnp.maximum(ptr, 0)
        hot = jax.nn.one_hot(ptr_safe, N, dtype=jnp.float32)  # [B, N, N]
        up = jnp.einsum("bmn,bn->bm", hot, reach)
        reach = jnp.maximum(reach, jnp.where(ptr >= 0, up, 0.0))
        ptr_up = jnp.einsum(
            "bmn,bn->bm", hot, parent_f, precision=jax.lax.Precision.HIGHEST
        )
        ptr = jnp.where(ptr >= 0, ptr_up.astype(jnp.int32), -1)
    kept = (reach > 0.5) & valid_slot

    # stable permutation: new root first, then other kept nodes, then free
    key = jnp.where(nidx[None, :] == new_root_safe[:, None], 0, jnp.where(kept, 1, 2))
    order = jnp.argsort(key, axis=1, stable=True)  # [B, N] old indices
    inv = jnp.zeros((B, N), jnp.int32).at[bidx[:, None], order].set(
        jnp.broadcast_to(nidx[None, :], (B, N))
    )
    n_kept = kept.sum(axis=1)
    live = nidx[None, :] < n_kept[:, None]  # mask in NEW index space

    # Apply the permutation with ONE one-hot matmul per array (P[b,new,old]),
    # not [B,N]-indexed gathers (see above). HIGHEST precision keeps integer
    # payloads (indices, int8 boards) exact as f32 values; uint32 hash words
    # are split into f32-exact 16-bit halves by the caller.
    P = jax.nn.one_hot(order, N, dtype=jnp.float32)  # [B, N(new), N(old)]

    def g2(arr):
        shape = arr.shape
        dt = arr.dtype
        flat = arr.reshape(B, N, -1)
        out = jnp.einsum(
            "bmn,bnc->bmc",
            P,
            flat.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        if dt == jnp.bool_:
            return (out > 0.5).reshape(shape)
        if jnp.issubdtype(dt, jnp.integer):
            return jnp.round(out).astype(dt).reshape(shape)
        return out.astype(dt).reshape(shape)

    def g2_u32(arr):  # [B, N] or [B, N, C] uint32, via 16-bit halves
        lo = (arr & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (arr >> jnp.uint32(16)).astype(jnp.float32)
        lo_p = jnp.round(g2(lo)).astype(jnp.uint32)
        hi_p = jnp.round(g2(hi)).astype(jnp.uint32)
        return (hi_p << jnp.uint32(16)) | lo_p

    g3 = g2

    # children: remap through the keep set (dropped targets become -1)
    ch_g = g3(tree.children)
    ch_vals = jnp.maximum(ch_g, 0)
    child_kept = (ch_g >= 0) & kept[bidx[:, None, None], ch_vals]
    ch_new = jnp.where(child_kept & live[:, :, None], inv[bidx[:, None, None], ch_vals], -1)
    ev_new = jnp.where(ch_new >= 0, g3(tree.edge_visits), 0)

    par_g = g2(tree.parent)
    par_vals = jnp.maximum(par_g, 0)
    par_kept = (par_g >= 0) & kept[bidx[:, None], par_vals]
    par_new = jnp.where(par_kept & live, inv[bidx[:, None], par_vals], -1)
    par_new = par_new.at[:, 0].set(-1)  # the new root has no parent

    use_bias = sp.subtreeValueBiasFactor != 0.0
    if use_bias:
        # freed nodes give back freeProp of their last table contribution
        dropped = valid_slot & ~kept
        fp = sp.subtreeValueBiasFreeProp
        table = tree.bias_table.at[bidx[:, None], tree.bias_key].add(
            jnp.stack(
                [
                    jnp.where(dropped, -fp * tree.last_bias_delta, 0.0),
                    jnp.where(dropped, -fp * tree.last_bias_weight, 0.0),
                ],
                axis=-1,
            )
        )
        last_bd = jnp.where(live, g2(tree.last_bias_delta), 0.0)
        last_bw = jnp.where(live, g2(tree.last_bias_weight), 0.0)
        bias_key = g2(tree.bias_key)
    else:
        table = tree.bias_table
        last_bd = tree.last_bias_delta
        last_bw = tree.last_bias_weight
        bias_key = tree.bias_key

    # Fresh root prior for the reused root (beginSearch re-noises). The
    # reference re-evaluates the root node with root-eval settings when it
    # becomes root (multi-symmetry averaging, searchnnhelpers.cpp isRoot
    # path); `res` above IS that evaluation of the new root position, so the
    # reused root's raw prior/ranks are refreshed from it. Its self_stats
    # keep the original leaf eval (weight ~1 of the whole subtree; deviation
    # documented).
    reused_prior = g3(tree.prior).at[:, 0].set(fresh.prior[:, 0])
    reused_raw = fresh.prior[:, 0]
    legal = reused_raw >= 0
    reused_root_prior = _make_root_prior(
        cfg, sp, jnp.maximum(reused_raw, 0.0), legal,
        root_states, k_noise2, turn_number, root_hint,
        root_avoid=root_avoid,
    )
    reused_rank = (
        g3(tree.policy_rank).at[:, 0].set(fresh.policy_rank[:, 0])
        if sp.useNoisePruning
        else tree.policy_rank
    )

    def g_any(x):  # dtype-dispatched permute (states contain uint32 hashes)
        return g2_u32(x) if x.dtype == jnp.uint32 else g2(x)

    reused = Tree(
        states=jax.tree_util.tree_map(g_any, tree.states),
        stats=jnp.where(live[:, :, None], g3(tree.stats), 0.0),
        self_stats=jnp.where(live[:, :, None], g3(tree.self_stats), 0.0),
        prior=reused_prior,
        root_prior=reused_root_prior,
        children=ch_new,
        edge_visits=ev_new,
        parent=par_new,
        parent_action=g2(tree.parent_action),
        is_terminal=jnp.where(live, g2(tree.is_terminal), False),
        node_count=n_kept,
        sit_hash=g2_u32(tree.sit_hash),
        policy_rank=reused_rank,
        bias_key=bias_key,
        last_bias_delta=last_bd,
        last_bias_weight=last_bw,
        bias_table=table,
        root_hint=fresh.root_hint,
    )

    def merge(r, f):
        m = jnp.reshape(has, (B,) + (1,) * (r.ndim - 1))
        return jnp.where(m, r, f)

    return jax.tree_util.tree_map(merge, reused, fresh)


# ---------------------------------------------------------------------------
# Results extraction (searchresults.cpp)
# ---------------------------------------------------------------------------


def root_visit_counts(tree: Tree) -> jax.Array:
    """[B, A] root edge-visit counts — what getPlaySelectionValues uses
    (with transpositions, edge visits are the root's own exploration)."""
    return tree.edge_visits[:, 0, :]


def root_child_weights(tree: Tree) -> jax.Array:
    """[B, A] edge-scaled child weights at the root."""
    B = tree.children.shape[0]
    bidx = jnp.arange(B)
    return _child_edge_stats(tree, bidx, jnp.zeros((B,), jnp.int32))["w"]


def root_values(tree: Tree):
    """Root aggregate values (ReportedSearchValues equivalent): utility and
    winloss from the root mover's perspective, plus per-child Q [B, A]."""
    B = tree.children.shape[0]
    bidx = jnp.arange(B)
    cs = _child_edge_stats(tree, bidx, jnp.zeros((B,), jnp.int32))
    return {
        "root_utility": tree.stats[:, 0, S_U],
        "root_wl": tree.stats[:, 0, S_WL],
        "root_draw": tree.stats[:, 0, S_DRAW],
        "child_utility": cs["u"],
        "child_wl": cs["wl"],  # parent perspective, 0 for missing edges
        "child_draw": cs["draw"],
        "root_visits": (tree.stats[:, 0, S_VISITS] + 0.5).astype(jnp.int32),
    }


def _root_explore_scaling(sp: SearchParams, tree: Tree, cs) -> jax.Array:
    """Root exploreScaling = cPUCT(W)·√(W+0.01)·parentUtilityStdevFactor
    (searchexplorehelpers.cpp:9-25,262-285) — the same quantities
    _select_action computes during descent, exposed for play-selection
    post-processing (getReducedPlaySelectionWeight)."""
    B = tree.children.shape[0]
    bidx = jnp.arange(B)
    node = jnp.zeros((B,), jnp.int32)
    total_child_w = cs["w"].sum(-1)
    cpuct = sp.cpuctExploration + sp.cpuctExplorationLog * jnp.log(
        (total_child_w + sp.cpuctExplorationBase) / sp.cpuctExplorationBase
    )
    if sp.cpuctUtilityStdevScale != 0.0:
        node_stats = tree.stats[bidx, node]
        w_sum = node_stats[:, S_W]
        u = node_stats[:, S_U]
        usq = jnp.maximum(node_stats[:, S_USQ], u * u)
        var_prior = sp.cpuctUtilityStdevPrior**2
        pw = sp.cpuctUtilityStdevPriorWeight
        stdev = jnp.sqrt(
            jnp.maximum(
                0.0,
                ((u * u + var_prior) * pw + usq * w_sum) / (pw + jnp.maximum(w_sum - 1.0, _EPS))
                - u * u,
            )
        )
        stdev = jnp.where(w_sum <= 1.0, sp.cpuctUtilityStdevPrior, stdev)
        stdev_factor = 1.0 + sp.cpuctUtilityStdevScale * (
            stdev / sp.cpuctUtilityStdevPrior - 1.0
        )
    else:
        stdev_factor = jnp.ones((B,), jnp.float32)
    return cpuct * jnp.sqrt(total_child_w + 0.01) * stdev_factor


def root_play_selection_weights(sp: SearchParams, tree: Tree, cs=None) -> jax.Array:
    """Root play-selection values [B, A]: edge-scaled child weights with the
    reference's retrospective over-visited reduction
    (getPlaySelectionValues, searchresults.cpp:110-186 +
    getReducedPlaySelectionWeight, searchexplorehelpers.cpp:209-242).

    The goodness-best child (weight discounted by one visit + 2·policy) is
    kept; every other child is capped at the weight that the best child's
    final explore-selection value retrospectively implies:
    w_wanted = exploreScaling·P / (bestSelectionValue − u) − 1. This removes
    forced-playout and noise-driven excess weight from both move selection
    and training policy targets, exactly as the reference does."""
    B = tree.children.shape[0]
    A = tree.children.shape[-1]
    bidx = jnp.arange(B)
    if cs is None:
        cs = _child_edge_stats(tree, bidx, jnp.zeros((B,), jnp.int32))
    w = cs["w"]
    u = cs["u"]  # parent (mover) perspective
    evis = cs["evis"]
    live = cs["live"] & (w > 0)
    legal_prior = jnp.maximum(tree.root_prior, 0.0)

    # goodness-picked nonLCB best child (searchresults.cpp:115-133)
    g = w * jnp.maximum(evis - 1.0, 0.0) / jnp.maximum(evis, 1.0) + 2.0 * legal_prior
    g = jnp.where(live, g, -jnp.inf)
    best = jnp.argmax(g, -1)
    onehot_best = jax.nn.one_hot(best, A, dtype=bool)
    any_live = live.any(-1)

    scaling = _root_explore_scaling(sp, tree, cs)
    take = lambda x: jnp.take_along_axis(x, best[:, None], axis=-1)
    best_sel = (scaling[:, None] * take(legal_prior) / (1.0 + take(w)) + take(u))

    # getExploreSelectionValueInverse (searchexplorehelpers.cpp:47-69)
    denom = best_sel - u
    wanted = jnp.where(
        denom > 0,
        scaling[:, None] * legal_prior / jnp.maximum(denom, _EPS) - 1.0,
        jnp.inf,
    )
    wanted = jnp.maximum(wanted, 0.0)
    reduced = jnp.ceil(jnp.minimum(w, wanted))  # the reference ceil()s reduced weights
    out = jnp.where(onehot_best | ~any_live[:, None], w, reduced)
    return jnp.where(live, out, 0.0)


def _child_utility_stdev(tree: Tree, cs=None):
    """Per-root-child utility stdev for LCB (searchresults.cpp
    getSelfUtilityLCBAndRadius semantics, simplified to weight-based
    precision)."""
    B = tree.children.shape[0]
    bidx = jnp.arange(B)
    if cs is None:
        cs = _child_edge_stats(tree, bidx, jnp.zeros((B,), jnp.int32))
    u = cs["u"]
    var = jnp.maximum(cs["usq"] - u * u, 1e-8)
    # effective sample size from weight distribution
    ess = jnp.where(cs["wsq"] > 0, cs["w"] ** 2 / jnp.maximum(cs["wsq"], _EPS), 1.0)
    stdev = jnp.sqrt(var / jnp.maximum(ess, 1.0))
    return (
        jnp.where(cs["live"], u, -1e30),
        jnp.where(cs["live"], stdev, 1e30),
        cs["w"],
    )


@jax.named_scope("ph_moveselect")
def select_moves(
    cfg: GameConfig,
    sp: SearchParams,
    tree: Tree,
    rng: jax.Array,
    turn_number: jax.Array | None = None,
) -> jax.Array:
    """getChosenMoveLoc equivalent (searchresults.cpp): visit-count move
    selection with optional LCB override and temperature. Returns [B] flat
    actions."""
    B = tree.children.shape[0]
    A = tree.children.shape[-1]
    legal = tree.root_prior >= 0
    cs = _child_edge_stats(tree, jnp.arange(B), jnp.zeros((B,), jnp.int32))
    # base play-selection values: child weights with the reference's
    # retrospective over-visited reduction
    w_base = root_play_selection_weights(sp, tree, cs)

    if sp.useLcbForSelection:
        # Reference weight-blend (getPlaySelectionValues,
        # searchresults.cpp:188-233, useNonBuggyLcb): the best-LCB eligible
        # child's play-selection WEIGHT is boosted to
        # max_i ((radius_i+excess_i)/(radius_i+0.2*excess_i))^2 * w_i over
        # children whose LCB it beats, then the temperature choice runs over
        # the adjusted weights. Deviations (documented): eligibility compares
        # against the max child weight rather than the goodness-picked
        # nonLCB-best child, and no over-visited weight reduction.
        u, stdev, _raw_w = _child_utility_stdev(tree, cs)
        w = w_base
        radius = sp.lcbStdevs * stdev
        lcb = u - radius
        max_w = w.max(-1, keepdims=True)
        eligible = (w > 0) & (w >= sp.minVisitPropForLCB * max_w)
        lcb_elig = jnp.where(eligible, lcb, -jnp.inf)
        best_lcb = lcb_elig.max(-1, keepdims=True)
        best_idx = jnp.argmax(lcb_elig, -1)
        any_elig = eligible.any(-1)
        excess = best_lcb - lcb  # >= 0 unless an ineligible child has better LCB
        rf = (radius + excess) / jnp.maximum(radius + 0.2 * excess, _EPS)
        onehot_best = jax.nn.one_hot(best_idx, A, dtype=bool)
        lbound = jnp.where(
            (excess >= 0) & ~onehot_best & (w > 0), rf * rf * w, 0.0
        )
        boosted = jnp.maximum(
            jnp.take_along_axis(w, best_idx[:, None], axis=-1),
            lbound.max(-1, keepdims=True),
        )
        w_sel = jnp.where(onehot_best & any_elig[:, None], boosted, w)
    else:
        w_sel = w_base

    # temperature choice (chooseIndexWithTemperature)
    if turn_number is None:
        turn_number = tree.states.num_turns[:, 0].astype(jnp.float32)
    else:
        turn_number = turn_number.astype(jnp.float32)
    frac = 0.5 ** (turn_number / sp.chosenMoveTemperatureHalflife)
    temp = sp.chosenMoveTemperature + frac * (
        sp.chosenMoveTemperatureEarly - sp.chosenMoveTemperature
    )
    temp = jnp.maximum(temp, 1e-4)

    # chooseIndexWithTemperature over play-selection weights (the reference
    # subtracts chosenMoveSubtract and prunes below chosenMovePrune on the
    # same weights, searchresults.cpp getChosenMoveLoc)
    v = jnp.maximum(w_sel - sp.chosenMoveSubtract, 0.0)
    v = jnp.where(w_sel < sp.chosenMovePrune, 0.0, v)
    v = jnp.where(legal, v, 0.0)
    logits = jnp.where(v > 0, jnp.log(jnp.maximum(v, 1e-30)) / temp[:, None], -jnp.inf)
    # if no child has weight (can't happen after >=1 sim on a live game),
    # fall back to argmax prior
    any_v = (v > 0).any(-1)
    fallback = jnp.argmax(jnp.where(legal, tree.root_prior, -jnp.inf), -1)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    greedy = jnp.argmax(v, -1)
    # hard-argmax when temperature is effectively zero
    choice = jnp.where(temp[:] <= 1e-3, greedy, sampled)
    choice = jnp.where(any_v, choice, fallback)
    return choice.astype(jnp.int32)


def policy_target(tree: Tree, sp: SearchParams) -> jax.Array:
    """Training policy target (extractPolicyTarget → getPlaySelectionValues,
    play.cpp:635): the reference's play-selection weights, whose
    retrospective over-visited reduction (getReducedPlaySelectionWeight)
    removes the excess weight that root forced playouts and Dirichlet noise
    drove into non-best children."""
    v = root_play_selection_weights(sp, tree)
    total = v.sum(-1, keepdims=True)
    return jnp.where(total > 0, v / jnp.maximum(total, _EPS), 0.0)
