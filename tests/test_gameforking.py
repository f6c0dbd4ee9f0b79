"""Whole-game forking tests (Play::maybeForkGame, play.cpp:1741-1827;
maybeHintForkGame, play.cpp:1830-1866; consumption priority,
play.cpp:1921-1925; knobs playsettings.h:29-35 / selfplay1.cfg:26-33)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import (
    GameConfig,
    init_state,
    legal_mask_flat,
    step,
)
from katacoffee_tpu.search import SearchParams
from katacoffee_tpu.search.mcts import uniform_eval_fn
from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment
from katacoffee_tpu.selfplay.forking import (
    ForkPool,
    choose_fork_moves,
    extract_fork_candidates,
    init_fork_pool,
    refill_pool,
)

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0)


def _uniform_segment(settings, B=4, T=8, seed=0, fork_pool=None):
    ev = uniform_eval_fn(CFG)
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    fn = jax.jit(
        lambda s, e, r, fp: run_selfplay_segment(
            CFG, SP, settings, ev, s, e, r, T, fork_pool=fp
        )
    ) if fork_pool is not None else jax.jit(
        lambda s, e, r: run_selfplay_segment(CFG, SP, settings, ev, s, e, r, T)
    )
    if fork_pool is not None:
        return fn(states, ep, jax.random.PRNGKey(seed), fork_pool)
    return fn(states, ep, jax.random.PRNGKey(seed))


SETTINGS = SelfplaySettings(
    num_sims=16,
    init_games_with_policy=False,
    policy_surprise_weight=0.0,
    value_surprise_weight=0.0,
)


def test_choose_fork_moves_properties():
    """Fork states are the input position plus exactly one legal move; done
    children are dropped (play.cpp:1823-1826)."""
    K = 6
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(K))
    # play two fixed moves on each board so the positions are mid-game
    a0 = jnp.full((K,), 12, jnp.int32)  # spot 12 (2,2), dir N
    states = jax.vmap(functools.partial(step, CFG))(states, a0)
    legal = jax.vmap(functools.partial(legal_mask_flat, CFG))(states)
    a1 = jnp.argmax(legal, axis=-1).astype(jnp.int32)
    states = jax.vmap(functools.partial(step, CFG))(states, a1)

    valid = jnp.ones((K,), bool)
    maxc = jnp.full((K,), 12, jnp.int32)
    forced = jnp.full((K,), -1, jnp.int32)
    ev = uniform_eval_fn(CFG)
    out = choose_fork_moves(
        CFG, ev, states, valid, maxc, forced, jax.random.PRNGKey(5)
    )
    assert bool(out.valid.all())
    nt_in = np.asarray(states.num_turns)
    nt_out = np.asarray(out.states.num_turns)
    assert (nt_out == nt_in + 1).all()
    assert not np.asarray(out.states.done).any()
    # the move played must have been legal in the source position
    legal_np = np.asarray(legal := jax.vmap(functools.partial(legal_mask_flat, CFG))(states))
    played_spot = np.asarray(out.states.last_spot)
    played_dir = np.asarray(out.states.last_dir)
    for k in range(K):
        act = int(played_dir[k]) * CFG.area + int(played_spot[k])
        assert legal_np[k, act], f"illegal fork move {act} on candidate {k}"


def test_choose_fork_moves_forced_and_invalid():
    """forced >= 0 plays exactly that move (hint forks, play.cpp:1857-1859);
    an illegal forced move or invalid candidate gives an invalid fork."""
    K = 3
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(K))
    target = 7  # spot 7, dir N — legal on an empty board
    forced = jnp.asarray([target, -1, target], jnp.int32)
    valid = jnp.asarray([True, False, True])
    maxc = jnp.full((K,), 12, jnp.int32)
    # candidates 0-1 open at spot 2 dir N, putting spot 7 (same column) on
    # the legal line; candidate 2 occupies spot 7 itself, making the forced
    # move illegal
    states2 = jax.vmap(functools.partial(step, CFG))(
        states, jnp.asarray([2, 2, target], jnp.int32)
    )
    ev = uniform_eval_fn(CFG)
    out = choose_fork_moves(
        CFG, ev, states2, valid, maxc, forced, jax.random.PRNGKey(0)
    )
    v = np.asarray(out.valid)
    assert v[0] and not v[1] and not v[2]
    assert int(out.states.last_spot[0]) == target % CFG.area
    assert int(out.states.last_dir[0]) == target // CFG.area


def test_extract_candidates_every_episode():
    """early_fork_prob=1 yields one early-fork candidate per completed
    in-window episode, each pointing at a row inside that episode."""
    _, _, traj = _uniform_segment(SETTINGS, B=4, T=30, seed=1)
    traj_np = jax.tree_util.tree_map(np.asarray, traj)
    rng = np.random.default_rng(0)
    cands = extract_fork_candidates(
        CFG, traj_np, rng, early_fork_prob=1.0, fork_prob=0.0
    )
    assert cands is not None
    flat_idx, maxcs, forceds = cands
    done = np.asarray(traj.done_after)
    T, B = done.shape
    n_complete = 0
    for b in range(B):
        t = 0
        while t < T:
            seg_done = np.flatnonzero(done[t:, b])
            if len(seg_done) == 0:
                break
            n_complete += 1
            t += seg_done[0] + 1
    assert len(flat_idx) == n_complete
    assert (maxcs == 12).all()
    assert (forceds == -1).all()
    # every candidate row is a pre-terminal row of its episode
    ep = np.asarray(traj.episode_id)
    for fi in flat_idx:
        t, b = divmod(int(fi), B)
        assert not done[:t, b][ep[:t, b] == ep[t, b]].any()


def test_segment_consumes_pool_with_priority():
    """Resetting games pop pooled fork positions (non-empty starting boards),
    skipping policy-init; the pool drains by the number of resets."""
    # pool of 8 positions, each two plies deep
    Kf = 8
    pool0 = init_fork_pool(CFG, Kf)
    st = jax.vmap(lambda _: init_state(CFG))(jnp.arange(Kf))
    st = jax.vmap(functools.partial(step, CFG))(st, jnp.full((Kf,), 12, jnp.int32))
    legal = jax.vmap(functools.partial(legal_mask_flat, CFG))(st)
    st = jax.vmap(functools.partial(step, CFG))(
        st, jnp.argmax(legal, -1).astype(jnp.int32)
    )
    new = ForkPool(states=st, valid=jnp.ones((Kf,), bool))
    pool = refill_pool(pool0, new)
    assert int(pool.valid.sum()) == Kf

    settings = SETTINGS  # policy-init off anyway; forks must start at ply 2
    _, _, traj, pool_out = _uniform_segment(
        settings, B=4, T=40, seed=3, fork_pool=pool
    )
    done = np.asarray(traj.done_after)
    nturns = np.asarray(traj.states.num_turns)
    ep = np.asarray(traj.episode_id)
    T, B = done.shape
    n_resets = int(done.sum())
    consumed = Kf - int(np.asarray(pool_out.valid).sum())
    assert consumed == min(n_resets, Kf)
    assert consumed > 0
    # episodes that began from a consumed fork start at num_turns == 2 (the
    # pooled positions' depth); a consumed fork's first row can only be
    # missing if its reset was on the segment's final move
    starts = []
    for b in range(B):
        for t in range(1, T):
            if ep[t, b] != ep[t - 1, b]:
                starts.append(nturns[t, b])
    starts = np.asarray(starts)
    assert int((starts == 2).sum()) >= consumed - B


def test_daemon_integration(tmp_path):
    """The selfplay daemon with forking enabled writes rows and drains/refills
    its pool without error."""
    from katacoffee_tpu.command.selfplay import SelfplayConfig, run_selfplay_daemon

    spc = SelfplayConfig(
        batch_size=4,
        num_sims=12,
        moves_per_segment=8,
        segments_per_flush=2,
        max_segments=6,
        use_mesh=False,
        side_position_prob=0.0,
        early_fork_game_prob=0.5,
        fork_game_prob=0.2,
        write_sgfs=False,
        seed=11,
    )
    rows = run_selfplay_daemon(str(tmp_path), CFG, SP, spc)
    assert rows > 0
