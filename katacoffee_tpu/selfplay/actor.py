"""Lockstep selfplay actor: the TPU inversion of the reference's
thread-per-game selfplay (`cpp/command/selfplay.cpp`, `cpp/program/play.cpp`).

Where the reference runs numGameThreads CPU threads each stepping one game and
funneling NN evals into a batching server (SURVEY.md §2.8 P2-P3), here ONE
jitted `lax.scan` advances B games a move at a time: every move runs the
batched MCTS (`search/mcts.py`), so the NN forward always sees [B × …] work.
Finished games auto-reset inside the scan, keeping the batch dense (the
reference's ragged-game problem disappears; SURVEY.md §7 "hard parts").

Per-move data capture mirrors Play::runGame's target extraction
(play.cpp:1300-1326): policy target from play-selection weights (with
forced-playout pruning), root value estimates for TD targets, played action,
plus game-end back-fill of final outcome / ownership / longest-line targets
(play.cpp:1431-1459) done as a reverse scan in `finalize_targets`.

Deliberate round-1 deviations from the reference's data tricks (documented,
SURVEY.md §2.5):
  * no cheap/reduced-search move randomization (getSearchLimitsThisMove,
    play.cpp:871-1005): its purpose is saving compute on moves that produce
    weight-0 rows; in lockstep batching, skipping per-game saves nothing, so
    every move gets full visits (strictly better data);
  * no policy-initialized openings / game forking yet — opening diversity
    comes from Dirichlet noise + early temperature; planned round 2;
  * resignation disabled, as in training selfplay (selfplay configs keep
    full-data games; play.cpp:1432 context).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from katacoffee_tpu.game.board import GameConfig, GameState, init_state, step
from katacoffee_tpu.search import mcts
from katacoffee_tpu.search.params import SearchParams


@dataclasses.dataclass(frozen=True)
class SelfplaySettings:
    """Selfplay data knobs (the live subset of the reference PlaySettings,
    playsettings.h:6-94)."""

    num_sims: int = 100
    max_nodes: int | None = None  # default node_budget_frac * num_sims
    # Selfplay node budget: the per-level one-hot gather einsum AND the
    # dual-layout copies of the [B,N,A] buffers (round-4 phase split) scale
    # with the node capacity N, so capacity is the main selfplay perf knob.
    # Overflowing playouts revisit their leaf with catch-up bookkeeping (the
    # same graceful degradation as a full memory-capped reference tree).
    # History: 1.0 -> 0.64 (round 1, +33% visits/s, move agreement within
    # seed noise); 0.64 -> 0.4 -> 0.3 (round 4, +21% then +19.5% visits/s —
    # and an END-TO-END gate this time: twin b2c32 nets trained on 24k-row
    # datasets generated at each budget are statistically identical in a
    # 900-game three-way round-robin at 150-visit uncapped match searches,
    # all within +/-3 Elo at +/-14; artifacts/nodebudget_{ab,quality}.json).
    # Re-run tools/nodebudget_quality.py before pushing below 0.3 — each
    # step truncates more of the ~600-node demand (CLAUDE.md perf facts).
    # GATE SCOPE LIMIT (ADVICE r4): the round-4 gate used b2c32 proxy nets
    # on 5x5 at +/-14 Elo resolution; the budget binds hard (~180 slots vs
    # ~600 demanded), so effects below that power, or specific to larger
    # nets/boards, were undetected there. Round-5 re-gate at flagship scale:
    # see artifacts/nodebudget_flagship.json / STATUS.md before relying on
    # 0.3 for larger boards/models.
    node_budget_frac: float = 0.3
    # TD lambdas, from the reference's boardArea-scaled formulas
    # (trainingwrite.h:141-146): lambda = 1 - 1/(1 + boardArea * c)
    td_coeffs: tuple = (0.176, 0.056, 0.016)
    # Policy-initialized openings (PlayUtils::initializeGameUsingPolicy,
    # playutils.cpp:147-174; selfplay1.cfg:55-56): each episode opens with
    # ~Exponential()·area·prop moves sampled from the raw policy at
    # `policy_init_temperature`; those rows get weight 0 (they are opening
    # randomization, not training targets).
    init_games_with_policy: bool = True
    policy_init_area_prop: float = 0.04
    policy_init_temperature: float = 1.0
    # Surprise-weighted rows (play.cpp:1501-1570; selfplay1.cfg:75-76):
    # this share of each episode's training weight is re-concentrated on
    # rows whose search outcome surprised the raw policy / raw value.
    policy_surprise_weight: float = 0.5
    value_surprise_weight: float = 0.1
    # fraction of episodes starting from a startpos_pool position
    # (startPosesProb, selfplay1.cfg:37)
    startposes_prob: float = 0.0
    # fraction of episodes starting from a hintpos_pool position
    # (hintPosesProb, selfplay1.cfg:41): the position's recorded move becomes
    # rootHintLoc for the episode's FIRST search (2% policy shift + forced
    # selection, searchhelpers.cpp:206-218 / searchexplorehelpers.cpp:155).
    # Deviation (docs/DESIGN.md): the reference's 4x visit bump on hint moves
    # is skipped — per-game visit budgets gate the whole lockstep batch.
    hintposes_prob: float = 0.0
    # Side-position forking (sidePositionProb, selfplay1.cfg:58 = 0.020;
    # play.cpp:1328-1345): with this probability per recorded move, fork the
    # position with a random NON-played move (70% policy temp 1, 25% policy
    # temp 2, 5% uniform legal — chooseRandomForkingMove, play.cpp:615) and
    # later run a full search on the fork, training on refuting bad
    # alternative moves. Forks are batched across the segment and searched
    # in one device call (run_side_segment); the reference's 25%-probability
    # fork continuations carry over to the NEXT segment's side batch instead
    # of searching immediately (same expected data, no extra device calls).
    side_position_prob: float = 0.0
    # lanes in the per-segment side-position search; forks beyond capacity in
    # a segment are dropped (expected forks = moves*B*prob*1.33; size with
    # ~2x headroom)
    side_position_capacity: int = 128
    # Whole-game forking for opening diversity (Play::maybeForkGame,
    # play.cpp:1741-1827; playsettings.h:29-35; selfplay1.cfg:26-33):
    # finished episodes fork with prob early_fork_game_prob from a move
    # ~ Exp()·area·early_fork_game_expected_move_prop (else with
    # fork_game_prob from a uniform move); the fork plays the best of a few
    # random legal moves per the value net and seeds a future episode.
    # Candidates are spotted at flush time and pooled (selfplay/forking.py);
    # resetting games consume the pool in-graph with priority over
    # startposes/hintposes and skip policy-init openings (play.cpp:1921-1925).
    early_fork_game_prob: float = 0.0  # selfplay1.cfg:26 = 0.04
    early_fork_game_expected_move_prop: float = 0.025
    fork_game_prob: float = 0.0  # selfplay1.cfg:28 = 0.01
    fork_game_min_choices: int = 3
    early_fork_game_max_choices: int = 12
    fork_game_max_choices: int = 36
    fork_pool_capacity: int = 64
    # Tree-position recording (recordTreePositions, play.cpp:710-855;
    # playsettings.h:62-64 — default-off in the reference, no config key):
    # after each searched move, interior tree nodes reached by best-move
    # paths with >= record_tree_threshold visits become extra
    # side-position-style rows at record_tree_target_weight
    # (selfplay/treerecord.py). Capacity is the static per-(game, move)
    # row cap (TPU deviation: lowest-visits overflow dropped).
    record_tree_positions: bool = False
    record_tree_threshold: int = 0
    record_tree_target_weight: float = 0.0
    record_tree_capacity: int = 8
    # Tree reuse between moves (beginSearch reuse, search.cpp:262-331):
    # each move's search starts from the played child's subtree and only
    # plays out the visit deficit — reused visits count toward num_sims
    # like the reference's maxVisits. The search loop becomes a while_loop
    # gated on the slowest game in the batch.
    tree_reuse: bool = True


class Trajectory(NamedTuple):
    """Per-(move, game) records from a selfplay segment. Leaves [T, B, ...].
    States are the positions BEFORE each move; compact enough to re-derive
    NN features on device at train time (cheaper than storing planes)."""

    states: GameState
    policy_target: jax.Array  # [T, B, A]
    played_action: jax.Array  # [T, B]
    root_wl: jax.Array  # [T, B] search winloss, mover perspective
    root_draw: jax.Array  # [T, B] search draw probability
    root_visits: jax.Array  # [T, B]
    done_after: jax.Array  # [T, B] game ended on this move
    winner_after: jax.Array  # [T, B] winner if ended (0 draw)
    final_board: jax.Array  # [T, B, Y, X] filled during finalize
    episode_id: jax.Array  # [T, B] running episode counter per game
    raw_policy: jax.Array  # [T, B, A] root raw NN policy (for surprise)
    raw_value: jax.Array  # [T, B, 3] root raw NN win/loss/draw probs
    policy_init: jax.Array  # [T, B] row was a policy-init opening move
    fork_states: GameState  # [T, B, ...] side-position forks (post fork move)
    fork_valid: jax.Array  # [T, B] fork lane holds a real side position
    hint_first: jax.Array  # [T, B] row searched with an active rootHintLoc
    hint_action: jax.Array  # [T, B] the active rootHintLoc action (-1 none)
    # recorded interior tree positions (recordTreePositions; [T, B, M, ...],
    # M = record_tree_capacity, 0 when recording is off)
    tree_pos_states: GameState
    tree_pos_policy: jax.Array  # [T, B, M, A]
    tree_pos_value: jax.Array  # [T, B, M, 3] win/loss/draw, node mover persp.
    tree_pos_valid: jax.Array  # [T, B, M]


class TrainingBatch(NamedTuple):
    """Finalized training rows (flattened [R, ...]). The on-device analogue of
    the reference npz row schema (trainingwrite.h:112-197); see
    selfplay/data.py for the serialized form."""

    states: GameState
    policy_target: jax.Array  # [R, A]
    opponent_policy_target: jax.Array  # [R, A] next turn's policy target
    value_target: jax.Array  # [R, 3] win/loss/draw one-hot, mover persp.
    td_value_targets: jax.Array  # [R, num_lambdas, 3] win/loss/draw probs
    ownership_target: jax.Array  # [R, Y, X] -1/0/+1 mover persp.
    line_target: jax.Array  # [R, Y, X] int32 final per-cell longest run
    futurepos_target: jax.Array  # [R, 2, Y, X] ±1/0 boards at +2, +4 plies
    var_time_left_target: jax.Array  # [R] turns until game end
    shortterm_value_target: jax.Array  # [R] next-step search wl (mover persp.)
    weight: jax.Array  # [R] row weight (0 = masked/incomplete episode)
    opponent_policy_weight: jax.Array  # [R] 0 on final rows of an episode
    aux_weight: jax.Array  # [R] multiplier on game-outcome aux losses
    #   (ownership, longest-line, futurepos, varTimeLeft, shortterm error):
    #   1 for main-game rows, 0 for side-position rows, which have no game
    #   result (trainingwrite.cpp:134-153 passes NULL final targets)


def _sample_fork_move(cfg: GameConfig, key, raw_policy, ban_action):
    """chooseRandomForkingMove (play.cpp:615-634): 70% a temp-1 policy
    sample, 25% temp-2, 5% uniform over legal moves — never the banned
    (actually played) move. raw_policy is zero on illegal moves. Returns
    (action [B], ok [B]); ok False when no legal non-banned move exists."""
    B, A = raw_policy.shape
    k_mix, k_t1, k_t2, k_u = jax.random.split(key, 4)
    banned = jax.nn.one_hot(ban_action, A, dtype=bool)
    p = jnp.where(banned, 0.0, raw_policy)
    legal = p > 0
    ok = legal.any(-1)
    logits1 = jnp.where(legal, jnp.log(jnp.maximum(p, 1e-30)), -jnp.inf)
    a1 = jax.random.categorical(k_t1, logits1)
    a2 = jax.random.categorical(k_t2, logits1 / 2.0)
    au = jax.random.categorical(k_u, jnp.where(legal, 0.0, -jnp.inf))
    r = jax.random.uniform(k_mix, (B,))
    act = jnp.where(r < 0.70, a1, jnp.where(r < 0.95, a2, au))
    return jnp.where(ok, act, 0).astype(jnp.int32), ok


def run_selfplay_segment(
    cfg: GameConfig,
    sp: SearchParams,
    settings: SelfplaySettings,
    eval_fn: mcts.EvalFn,
    states: GameState,
    episode_id: jax.Array,
    rng: jax.Array,
    num_moves: int,
    startpos_pool: tuple[GameState, jax.Array] | None = None,
    hintpos_pool: tuple[GameState, jax.Array, jax.Array] | None = None,
    fork_pool=None,
):
    """Advance B games `num_moves` plies. Returns (new_states, new_episode_id,
    Trajectory) — plus the drained ForkPool when `fork_pool` is given. jit
    with static cfg/sp/settings/eval_fn/num_moves (fork_pool is traced, so
    host-side refills never recompile).

    `startpos_pool` = (stacked states [K], sampling probs [K]): with prob
    `settings.startposes_prob`, a resetting episode begins from a sampled
    start position instead of the empty board (the reference's startPosesProb
    game initialization, play.h:69-142; policy-init does not apply to those
    episodes, selfplay1.cfg:44 semantics).

    `hintpos_pool` = (states [K], probs [K], hint_actions [K]): with prob
    `settings.hintposes_prob`, a resetting episode begins from a hint
    position whose recorded move is rootHintLoc for the first search
    (hintPosesProb; play.cpp:424-446,885-901).

    `fork_pool` = ForkPool (selfplay/forking.py): queued whole-game fork
    positions. Every resetting game pops one while any remain — the
    reference's forkData->get() priority (play.cpp:1921-1925) — and skips
    policy-init/startpos/hintpos for that episode."""

    B = states.board.shape[0]
    max_nodes = settings.max_nodes or max(64, int(settings.num_sims * settings.node_budget_frac) + 2)

    def sample_init_len(key):
        """~Exponential()·area·prop opening moves (playutils.cpp:160-161)."""
        if not settings.init_games_with_policy:
            return jnp.zeros((B,), jnp.int32)
        e = jax.random.exponential(key, (B,))
        return jnp.floor(e * cfg.area * settings.policy_init_area_prop).astype(jnp.int32)

    def one_move(carry, key):
        st, ep, prev_tree, prev_action, reuse_ok, init_left, hint_act, pool_valid = carry
        k_search, k_move, k_init_move, k_init_len = jax.random.split(key, 4)
        tree = mcts.run_search(
            cfg, sp, eval_fn, st, settings.num_sims, k_search, max_nodes,
            reuse_tree=prev_tree, reuse_actions=prev_action, reuse_ok=reuse_ok,
            root_hint=hint_act,
        )
        pt = mcts.policy_target(tree, sp)
        raw_policy = jnp.maximum(tree.prior[:, 0], 0.0)
        selfs = tree.self_stats[:, 0]  # root raw NN eval (win/loss/draw)
        raw_draw = jnp.clip(selfs[:, mcts.F_DRAW], 0.0, 1.0)
        raw_wl = selfs[:, mcts.F_WL]
        raw_value = jnp.stack(
            [
                jnp.clip((1.0 - raw_draw + raw_wl) * 0.5, 1e-6, 1.0),
                jnp.clip((1.0 - raw_draw - raw_wl) * 0.5, 1e-6, 1.0),
                jnp.maximum(raw_draw, 1e-6),
            ],
            axis=-1,
        )

        search_action = mcts.select_moves(cfg, sp, tree, k_move)
        is_init = init_left > 0
        if settings.init_games_with_policy:
            # opening move straight from the tempered raw policy
            logits = jnp.where(
                raw_policy > 0,
                jnp.log(jnp.maximum(raw_policy, 1e-30)) / settings.policy_init_temperature,
                -jnp.inf,
            )
            init_action = jax.random.categorical(k_init_move, logits, axis=-1).astype(jnp.int32)
            action = jnp.where(is_init, init_action, search_action)
        else:
            action = search_action

        vals = mcts.root_values(tree)
        nxt = jax.vmap(functools.partial(step, cfg))(st, action)
        # side-position forking (play.cpp:1328-1345) — computed before tree
        # recording because the fork move joins the root exclusions below
        if settings.side_position_prob > 0.0:
            k_fork, k_forkmove = jax.random.split(jax.random.fold_in(key, 11))
            fork_move, fork_ok = _sample_fork_move(cfg, k_forkmove, raw_policy, action)
            fork_st = jax.vmap(functools.partial(step, cfg))(st, fork_move)
            do_fork = (
                (jax.random.uniform(k_fork, (B,)) < settings.side_position_prob)
                & ~is_init
            )
            # a finished fork is dropped (play.cpp:1340-1343)
            fork_valid = do_fork & fork_ok & ~fork_st.done
        else:
            fork_move = jnp.full((B,), -1, jnp.int32)
            fork_valid = jnp.zeros((B,), bool)
            fork_st = st
        rec = dict(
            states=st,
            policy_target=pt,
            played_action=action,
            root_wl=vals["root_wl"],
            root_draw=vals["root_draw"],
            root_visits=tree.visits[:, 0],
            done_after=nxt.done,
            winner_after=nxt.winner,
            final_board=nxt.board,
            episode_id=ep,
            raw_policy=raw_policy,
            raw_value=raw_value,
            policy_init=is_init,
            hint_first=hint_act >= 0,
            hint_action=hint_act,
        )
        rec["fork_valid"] = fork_valid
        rec["fork_states"] = fork_st
        # tree-position recording (recordTreePositions, play.cpp:1348-1365):
        # root exclusions are the played move and this turn's side fork move
        if settings.record_tree_positions and settings.record_tree_target_weight > 0:
            from katacoffee_tpu.selfplay.treerecord import record_tree_positions

            tp_states, tp_policy, tp_value, tp_valid = record_tree_positions(
                cfg, tree,
                exclude0=action,
                exclude1=jnp.where(fork_valid, fork_move, -1),
                row_ok=~is_init,
                threshold=settings.record_tree_threshold,
                capacity=settings.record_tree_capacity,
            )
            rec.update(
                tree_pos_states=tp_states, tree_pos_policy=tp_policy,
                tree_pos_value=tp_value, tree_pos_valid=tp_valid,
            )
        else:
            from katacoffee_tpu.selfplay.treerecord import (
                empty_tree_position_fields,
            )

            rec.update(empty_tree_position_fields(cfg, tree.states, B))
        # auto-reset finished games (optionally from a start position)
        fresh = jax.vmap(lambda _: init_state(cfg))(jnp.arange(st.board.shape[0]))
        from_startpos = jnp.zeros((B,), bool)
        if startpos_pool is not None and settings.startposes_prob > 0.0:
            pool, probs = startpos_pool
            k_sp1, k_sp2 = jax.random.split(jax.random.fold_in(key, 7))
            from_startpos = (
                jax.random.uniform(k_sp1, (B,)) < settings.startposes_prob
            )
            idx = jax.random.categorical(
                k_sp2, jnp.log(jnp.maximum(probs, 1e-30))[None, :].repeat(B, 0)
            )
            picked = jax.tree_util.tree_map(lambda x: x[idx], pool)
            fresh = jax.tree_util.tree_map(
                lambda f, p: jnp.where(
                    jnp.reshape(from_startpos, (-1,) + (1,) * (f.ndim - 1)), p, f
                ),
                fresh,
                picked,
            )
        from_hintpos = jnp.zeros((B,), bool)
        hint_new = jnp.full((B,), -1, jnp.int32)
        if hintpos_pool is not None and settings.hintposes_prob > 0.0:
            pool_h, probs_h, hints_h = hintpos_pool
            k_h1, k_h2 = jax.random.split(jax.random.fold_in(key, 9))
            from_hintpos = jax.random.uniform(k_h1, (B,)) < settings.hintposes_prob
            idx_h = jax.random.categorical(
                k_h2, jnp.log(jnp.maximum(probs_h, 1e-30))[None, :].repeat(B, 0)
            )
            picked_h = jax.tree_util.tree_map(lambda x: x[idx_h], pool_h)
            fresh = jax.tree_util.tree_map(
                lambda f, p: jnp.where(
                    jnp.reshape(from_hintpos, (-1,) + (1,) * (f.ndim - 1)), p, f
                ),
                fresh,
                picked_h,
            )
            hint_new = jnp.where(from_hintpos, hints_h[idx_h], -1)
        # whole-game fork pool: resetting games pop queued fork positions
        # first (forkData->get precedence, play.cpp:1921-1925)
        use_fork = jnp.zeros((B,), bool)
        if fork_pool is not None:
            pv = pool_valid
            vrank = jnp.cumsum(pv.astype(jnp.int32)) - 1  # [Kf] rank among valid
            rrank = jnp.cumsum(nxt.done.astype(jnp.int32)) - 1  # [B] rank among resets
            n_valid = pv.sum()
            use_fork = nxt.done & (rrank < n_valid)
            # game with reset-rank r takes the r-th valid pool entry
            assign = pv[None, :] & (vrank[None, :] == rrank[:, None])  # [B, Kf]
            e_for_b = jnp.argmax(assign, axis=1)
            picked_f = jax.tree_util.tree_map(
                lambda x: x[e_for_b], fork_pool.states
            )  # [B]-indexed row gather — the fast kind (CLAUDE.md)
            fresh = jax.tree_util.tree_map(
                lambda f, p: jnp.where(
                    jnp.reshape(use_fork, (-1,) + (1,) * (f.ndim - 1)), p, f
                ),
                fresh,
                picked_f,
            )
            pool_valid = pv & ~(vrank < nxt.done.sum())
            hint_new = jnp.where(use_fork, -1, hint_new)
        new_st = jax.tree_util.tree_map(
            lambda n, f: jnp.where(
                jnp.reshape(nxt.done, (-1,) + (1,) * (n.ndim - 1)), f, n
            ),
            nxt,
            fresh,
        )
        new_ep = ep + nxt.done.astype(jnp.int32)
        # policy-init does not apply to startpos/hintpos/forked episodes
        new_init_left = jnp.where(
            nxt.done,
            jnp.where(
                from_startpos | from_hintpos | use_fork, 0, sample_init_len(k_init_len)
            ),
            jnp.maximum(init_left - 1, 0),
        )
        # a hint applies only at the hint position itself — the episode's
        # first search (hintTurn == current turn, play.cpp:892-894)
        new_hint = jnp.where(nxt.done, hint_new, -1)
        if settings.tree_reuse:
            # next move reuses the played child's subtree unless the episode
            # just reset (the child is the done-state, not the fresh board)
            new_carry = (
                new_st, new_ep, tree, action, ~nxt.done, new_init_left, new_hint,
                pool_valid,
            )
        else:
            new_carry = (
                new_st, new_ep, prev_tree, prev_action, reuse_ok, new_init_left,
                new_hint, pool_valid,
            )
        return new_carry, rec

    k_init, k_len0, rng = jax.random.split(rng, 3)
    if settings.tree_reuse:
        # structural placeholder for the scan carry; reuse_ok=False makes the
        # first move ignore its contents and do a fresh root eval
        tree0 = mcts.init_tree(cfg, sp, eval_fn, states, max_nodes, k_init)
    else:
        tree0 = None
    # only fresh boards entering the segment get an opening-init phase
    init_left0 = jnp.where(states.num_turns == 0, sample_init_len(k_len0), 0)
    pool_valid0 = (
        fork_pool.valid if fork_pool is not None else jnp.zeros((0,), bool)
    )
    carry0 = (
        states,
        episode_id,
        tree0,
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
        init_left0,
        jnp.full((B,), -1, jnp.int32),
        pool_valid0,
    )
    keys = jax.random.split(rng, num_moves)
    (new_states, new_ep, *rest), recs = jax.lax.scan(one_move, carry0, keys)
    traj = Trajectory(**recs)
    if fork_pool is not None:
        from katacoffee_tpu.selfplay.forking import ForkPool

        return new_states, new_ep, traj, ForkPool(fork_pool.states, rest[-1])
    return new_states, new_ep, traj


def finalize_targets(
    cfg: GameConfig, settings: SelfplaySettings, traj: Trajectory
) -> TrainingBatch:
    """Reverse-scan the segment back-filling episode-final targets
    (play.cpp:1431-1459 + trainingwrite.cpp:400-561 semantics):
      * final game result (win/loss/draw one-hot + z in [-1,1]);
      * TD(lambda) value targets mixing future search values with z
        (trainingwrite.h:141-146), negamax-alternating;
      * final-board ownership (mover perspective) and per-cell longest line;
      * future position maps (+1, +2);
      * varTimeLeft = plies until game end;
      * rows from episodes that did not finish inside the segment get
        weight 0 (the lockstep analogue of the reference never truncating).
    All [T, B] vectorized; returns flattened [T*B] rows.
    """
    T, B = traj.played_action.shape
    area = cfg.area

    from katacoffee_tpu.game.board import per_cell_max_run

    lambdas = [
        1.0 - 1.0 / (1.0 + area * c) for c in settings.td_coeffs
    ]

    # z at each row: outcome for the mover at that row, backfilled in reverse.
    # done_after[t]: episode ended at t; winner_after[t] in {0,1,2}.
    mover = traj.states.to_move.astype(jnp.int32)  # [T, B]

    def rev_body(carry, xs):
        # carry (all refer to row t+1's episode unless noted):
        #   valid: does the episode containing row t+1 finish in-segment
        #   z_next/td_next: backed-up outcome / TD targets at t+1
        #   steps: plies from t+1 to episode end
        #   fboard: final board of episode containing t+1
        #   next_pt/next_wl: policy target / root value at t+1
        #   a1..a3: boards after moves t+1, t+2, t+3, clipped to the final
        #           board once the episode ends (for futurepos targets)
        (
            valid, z_next, td_next, td_draw_next, steps, fboard,
            next_pt, next_wl, a1, a2, a3,
        ) = carry
        (done_t, winner_t, mover_t, wl_t, draw_t, pt_t, board_after_t) = xs

        # z for the mover at t
        z_here_end = jnp.where(
            winner_t == 0, 0.0, jnp.where(winner_t == mover_t, 1.0, -1.0)
        )
        draw_end = (winner_t == 0).astype(jnp.float32)
        z = jnp.where(done_t, z_here_end, -z_next)

        td = []
        td_draw = []
        for i, lam in enumerate(lambdas):
            nxt = -td_next[i]
            td_i = jnp.where(done_t, z_here_end, (1.0 - lam) * wl_t + lam * nxt)
            td.append(td_i)
            td_d = jnp.where(
                done_t, draw_end, (1.0 - lam) * draw_t + lam * td_draw_next[i]
            )
            td_draw.append(td_d)
        td = jnp.stack(td)  # [L, B]
        td_draw = jnp.stack(td_draw)

        row_valid = done_t | (~done_t & valid)
        steps_here = jnp.where(done_t, 1, steps + 1)
        fb = jnp.where(done_t[:, None, None], board_after_t, fboard)
        # shortterm value target: the next search value from mover's view
        st_val = jnp.where(done_t, z_here_end, -next_wl)

        dmask = done_t[:, None, None]
        f1 = jnp.where(dmask, board_after_t, a1)  # +2 plies from row state
        f2 = jnp.where(dmask, board_after_t, a3)  # +4 plies from row state

        out = dict(
            valid=row_valid,
            z=z,
            td=td.T,  # [B, L]
            td_draw=td_draw.T,
            steps=steps_here,
            final_board=fb,
            next_policy=next_pt,
            opp_weight=(~done_t) & row_valid,
            shortterm=st_val,
            fut1=f1,
            fut2=f2,
        )
        new_carry = (
            row_valid,
            z,
            td,
            td_draw,
            steps_here,
            fb,
            pt_t,
            wl_t,
            board_after_t,
            jnp.where(dmask, board_after_t, a1),
            jnp.where(dmask, board_after_t, a2),
        )
        return new_carry, out

    L = len(lambdas)
    zeros_b = jnp.zeros((B,), jnp.float32)
    zb_board = jnp.zeros((B, cfg.y_size, cfg.x_size), jnp.int8)
    init = (
        jnp.zeros((B,), bool),
        zeros_b,
        jnp.zeros((L, B), jnp.float32),
        jnp.zeros((L, B), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        zb_board,
        jnp.zeros((B, cfg.policy_size), jnp.float32),
        zeros_b,
        zb_board,
        zb_board,
        zb_board,
    )
    # Hint rows: the first search's value is corrupted by the hint's forced
    # playouts — use the NEXT search's value (negated to this mover) instead,
    # as the reference copies whiteValueTargetsByTurn[0] from [1]
    # (play.cpp:1465-1470).
    wl_in, draw_in = traj.root_wl, traj.root_draw
    if settings.hintposes_prob > 0.0:
        wl_next = jnp.concatenate([wl_in[1:], wl_in[-1:]], axis=0)
        draw_next = jnp.concatenate([draw_in[1:], draw_in[-1:]], axis=0)
        use_next = traj.hint_first & ~traj.done_after
        wl_in = jnp.where(use_next, -wl_next, wl_in)
        draw_in = jnp.where(use_next, draw_next, draw_in)

    xs = (
        traj.done_after,
        traj.winner_after.astype(jnp.int32),
        mover,
        wl_in,
        draw_in,
        traj.policy_target,
        traj.final_board,
    )
    _, outs = jax.lax.scan(rev_body, init, xs, reverse=True)

    valid = outs["valid"]  # [T, B]
    z = outs["z"]
    fb = outs["final_board"]  # [T, B, Y, X]

    # value target one-hot [win, loss, draw] for the mover
    vt = jnp.stack(
        [
            (z > 0.5).astype(jnp.float32),
            (z < -0.5).astype(jnp.float32),
            (jnp.abs(z) <= 0.5).astype(jnp.float32),
        ],
        axis=-1,
    )

    # ownership: final board from mover perspective (+1 own, -1 opp, 0 empty)
    own = jnp.where(
        fb == mover[..., None, None].astype(jnp.int8),
        1.0,
        jnp.where(fb == 0, 0.0, -1.0),
    )

    # per-cell longest line on the final board (color-agnostic, stones only)
    def line_map(board):
        runs = per_cell_max_run(cfg, board)
        return jnp.where(board != 0, runs, 0)

    lines = jax.vmap(jax.vmap(line_map))(fb)

    # future board maps at +2 and +4 plies, ±1/0 from mover perspective,
    # clipped to the final board at episode end (valueTargetsNCHW C1-C2
    # intent, trainingwrite.cpp:486-561)
    def signed(board):
        m = mover[..., None, None].astype(jnp.int8)
        return jnp.where(board == m, 1.0, jnp.where(board == 0, 0.0, -1.0))

    futurepos = jnp.stack([signed(outs["fut1"]), signed(outs["fut2"])], axis=2)

    # policy-init opening rows are position randomization, not targets
    weight = (valid & ~traj.policy_init).astype(jnp.float32)

    # Surprise-based re-weighting per episode (play.cpp:1501-1570): keep each
    # episode's total weight, but concentrate policy_surprise_weight /
    # value_surprise_weight of it on rows where the search (policy) or the
    # final result (value) most surprised the raw net.
    psw = settings.policy_surprise_weight
    vsw0 = settings.value_surprise_weight
    if psw > 0.0 or vsw0 > 0.0:
        pt_ = traj.policy_target
        ps = jnp.where(
            pt_ > 0,
            pt_ * (jnp.log(jnp.maximum(pt_, 1e-30)) - jnp.log(jnp.maximum(traj.raw_policy, 1e-30))),
            0.0,
        ).sum(-1)  # [T, B] KL(search || raw policy)
        vs = -(vt * jnp.log(jnp.maximum(traj.raw_value, 1e-30))).sum(-1) + (
            vt * jnp.log(jnp.maximum(vt, 1e-30))
        ).sum(-1)  # KL(result || raw value)
        ps = jnp.maximum(ps, 0.0)
        vs = jnp.maximum(vs, 0.0)

        # per-(game, episode) segments; episode ids are made segment-relative
        ep_rel = traj.episode_id - traj.episode_id[0:1, :]
        sid = ep_rel * B + jnp.arange(B)[None, :]
        nseg = (T + 1) * B
        w_f, sid_f = weight.reshape(-1), sid.reshape(-1)
        ps_f, vs_f = ps.reshape(-1), vs.reshape(-1)
        W = jax.ops.segment_sum(w_f, sid_f, num_segments=nseg)
        PSP = jax.ops.segment_sum(w_f * ps_f, sid_f, num_segments=nseg)
        VSP = jax.ops.segment_sum(w_f * vs_f, sid_f, num_segments=nseg)
        avg_vs = VSP / jnp.maximum(W, 1e-8)
        # fade value-surprise weighting when the episode had almost none
        # (play.cpp:1527-1532)
        vsw = vsw0 * jnp.minimum(1.0, avg_vs / 0.010)
        Wd = W[sid_f]
        new_w = (
            (1.0 - psw - vsw[sid_f]) * w_f
            + psw * (w_f * ps_f) * Wd / jnp.maximum(PSP[sid_f], 1e-10)
            + vsw[sid_f] * (w_f * vs_f) * Wd / jnp.maximum(VSP[sid_f], 1e-10)
        )
        # only reweight episodes with enough rows (sumWeights >= 1)
        weight = jnp.where(Wd >= 1.0, new_w, w_f).reshape(T, B)

    def flat(x):
        return x.reshape((T * B,) + x.shape[2:])

    # convert (wl, draw) TD pairs to win/loss/draw probability targets:
    # p_win = (1 - p_draw + wl)/2, p_loss = (1 - p_draw - wl)/2
    td_wl = outs["td"]  # [T, B, L]
    td_d = jnp.clip(outs["td_draw"], 0.0, 1.0)
    td_win = jnp.clip((1.0 - td_d + td_wl) / 2.0, 0.0, 1.0)
    td_loss = jnp.clip((1.0 - td_d - td_wl) / 2.0, 0.0, 1.0)
    td_probs = jnp.stack([td_win, td_loss, td_d], axis=-1)  # [T, B, L, 3]
    norm = jnp.maximum(td_probs.sum(-1, keepdims=True), 1e-8)
    td_probs = td_probs / norm

    return TrainingBatch(
        states=jax.tree_util.tree_map(flat, traj.states),
        policy_target=flat(traj.policy_target),
        opponent_policy_target=flat(outs["next_policy"]),
        value_target=flat(vt),
        td_value_targets=flat(td_probs),
        ownership_target=flat(own),
        line_target=flat(lines),
        futurepos_target=flat(futurepos),
        var_time_left_target=flat(outs["steps"].astype(jnp.float32)),
        shortterm_value_target=flat(outs["shortterm"]),
        weight=flat(weight),
        opponent_policy_weight=flat(
            outs["opp_weight"].astype(jnp.float32) * weight
        ),
        aux_weight=jnp.ones((T * B,), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Side positions (play.cpp:1254,1328-1345,1578-1665)
# ---------------------------------------------------------------------------


class SideState(NamedTuple):
    """Cross-segment carry of pending side positions — the reference's
    sidePositionsToSearch queue (play.cpp:1254). Fork continuations sampled
    at the end of one segment's side search wait here for the next one."""

    states: GameState  # [C]
    valid: jax.Array  # [C] bool


def init_side_state(cfg: GameConfig, capacity: int) -> SideState:
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(capacity))
    return SideState(states=states, valid=jnp.zeros((capacity,), bool))


def run_side_segment(
    cfg: GameConfig,
    sp: SearchParams,
    settings: SelfplaySettings,
    eval_fn: mcts.EvalFn,
    side: SideState,
    traj: Trajectory,
    rng: jax.Array,
) -> tuple[SideState, TrainingBatch]:
    """Search the segment's queued side positions in ONE batched device call
    (the reference searches them serially after the game, play.cpp:1578-1628)
    and emit their training rows: the side search's policy target and its
    root value as a soft value/TD target, no opponent-policy or game-outcome
    aux targets (trainingwrite.cpp:120-158 side-position addRow).

    Also samples the reference's 25%-probability fork continuations
    (play.cpp:1634-1660): play the side search's chosen response plus a fresh
    forking move, and queue the result for the NEXT segment's side batch.
    jit with static cfg/sp/settings/eval_fn."""
    C = side.valid.shape[0]
    max_nodes = settings.max_nodes or max(
        64, int(settings.num_sims * settings.node_budget_frac) + 2
    )

    # merge carried continuations (kept first) with this segment's new forks
    flat_states = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), traj.fork_states
    )
    all_states = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], 0), side.states, flat_states
    )
    all_valid = jnp.concatenate([side.valid, traj.fork_valid.reshape(-1)])
    order = jnp.argsort(~all_valid, stable=True)[:C]
    states_c = jax.tree_util.tree_map(lambda x: x[order], all_states)
    valid_c = all_valid[order]

    k_search, k_move, k_cont, k_fork, k_eval = jax.random.split(rng, 5)
    tree = mcts.run_search(
        cfg, sp, eval_fn, states_c, settings.num_sims, k_search, max_nodes
    )
    pt = mcts.policy_target(tree, sp)
    vals = mcts.root_values(tree)
    wl, draw = vals["root_wl"], jnp.clip(vals["root_draw"], 0.0, 1.0)
    win = jnp.clip((1.0 - draw + wl) * 0.5, 0.0, 1.0)
    loss = jnp.clip((1.0 - draw - wl) * 0.5, 0.0, 1.0)
    vt = jnp.stack([win, loss, draw], axis=-1)
    vt = vt / jnp.maximum(vt.sum(-1, keepdims=True), 1e-8)
    L = len(settings.td_coeffs)
    td = jnp.broadcast_to(vt[:, None, :], (C, L, 3))

    Y, X = cfg.y_size, cfg.x_size
    weight = valid_c.astype(jnp.float32)
    batch = TrainingBatch(
        states=states_c,
        policy_target=pt,
        opponent_policy_target=jnp.zeros((C, cfg.policy_size), jnp.float32),
        value_target=vt,
        td_value_targets=td,
        ownership_target=jnp.zeros((C, Y, X), jnp.float32),
        line_target=jnp.zeros((C, Y, X), jnp.int32),
        futurepos_target=jnp.zeros((C, 2, Y, X), jnp.float32),
        var_time_left_target=jnp.zeros((C,), jnp.float32),
        shortterm_value_target=jnp.zeros((C,), jnp.float32),
        weight=weight,
        opponent_policy_weight=jnp.zeros((C,), jnp.float32),
        aux_weight=jnp.zeros((C,), jnp.float32),
    )

    # continuations: response move + fresh forking move, kept with prob 0.25
    response = mcts.select_moves(cfg, sp, tree, k_move)
    nxt = jax.vmap(functools.partial(step, cfg))(states_c, response)
    res = eval_fn(nxt, k_eval)
    fork2, ok2 = _sample_fork_move(cfg, k_fork, res.policy, jnp.full((C,), -1))
    st2 = jax.vmap(functools.partial(step, cfg))(nxt, fork2)
    keep = (
        valid_c
        & (jax.random.uniform(k_cont, (C,)) < 0.25)
        & ~nxt.done
        & ok2
        & ~st2.done
    )
    return SideState(states=st2, valid=keep), batch
