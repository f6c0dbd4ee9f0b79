"""Non-default board configs: rectangular boards (the reference's SZ[x:y]
support) and other win lengths, through env, search, eval randomization,
selfplay, and training — with the dihedral symmetry set correctly reduced to
4 on rectangles (no transpose)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game import symmetry as S
from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat, step
from katacoffee_tpu.search import (
    SearchParams,
    make_nn_eval_fn,
    root_visit_counts,
    run_search,
    select_moves,
    uniform_eval_fn,
)

RECT = GameConfig(5, 7, 4)
SMALL = GameConfig(4, 4, 3)


def test_num_symmetries():
    assert S.num_symmetries(GameConfig(5, 5, 4)) == 8
    assert S.num_symmetries(RECT) == 4
    assert S.num_symmetries(GameConfig(7, 5, 4)) == 4


@pytest.mark.parametrize("cfg", [RECT, SMALL, GameConfig(6, 6, 5)])
def test_env_and_search(cfg):
    sp = SearchParams(valueWeightExponent=0.0)
    roots = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), init_state(cfg)
    )
    tree = jax.jit(
        lambda r, k: run_search(cfg, sp, uniform_eval_fn(cfg), r, 20, k)
    )(roots, jax.random.PRNGKey(0))
    rv = np.asarray(root_visit_counts(tree))
    assert rv.sum(-1).min() == 20
    a = select_moves(cfg, sp, tree, jax.random.PRNGKey(1))
    legal = np.asarray(legal_mask_flat(cfg, init_state(cfg)))
    assert legal[int(a[0])]


def test_rect_full_profile_with_eval_randomization():
    """Full selfplay profile incl. random-symmetry evals on a rectangle
    must not touch the transpose symmetries."""
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params

    model = CoffeeNet(get_model_spec("b1c6"), win_len=RECT.win_len)
    params = init_params(model, RECT, jax.random.PRNGKey(0))
    ev = make_nn_eval_fn(RECT, model, params, symmetry_randomize=True)
    sp = SearchParams.for_selfplay()
    roots = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), init_state(RECT)
    )
    tree = jax.jit(lambda r, k: run_search(RECT, sp, ev, r, 24, k))(
        roots, jax.random.PRNGKey(2)
    )
    u = np.asarray(tree.utility_avg)
    assert np.isfinite(u).all()


def test_rect_selfplay_and_training():
    from katacoffee_tpu.selfplay import SelfplaySettings, finalize_targets, run_selfplay_segment
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet
    from katacoffee_tpu.train import TrainConfig, init_train_state, make_train_step

    cfg = RECT
    sp = SearchParams(valueWeightExponent=0.0)
    settings = SelfplaySettings(num_sims=4)
    B = 4
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    _, _, traj = jax.jit(
        lambda s, e, r: run_selfplay_segment(cfg, sp, settings, uniform_eval_fn(cfg), s, e, r, 36)
    )(states, ep, jax.random.PRNGKey(0))
    batch = finalize_targets(cfg, settings, traj)
    n = int((np.asarray(batch.weight) > 0).sum())
    assert n > 0

    model = CoffeeNet(get_model_spec("b1c6"), win_len=cfg.win_len)
    tc = TrainConfig(warmup_steps=1, symmetry_augment=True)  # 4-sym on rect
    R = (n // 4) * 4 or 4
    sub = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[:R]), batch)
    state = init_train_state(model, cfg, tc, batch_size=R, rng=jax.random.PRNGKey(0))
    step_fn = make_train_step(model, cfg, tc, batch_size=R)
    state, metrics = step_fn(state, sub, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_rect_gtp_boardsize():
    from katacoffee_tpu.command.gtp import GTPEngine

    eng = GTPEngine(GameConfig(5, 5, 4), SearchParams(valueWeightExponent=0.0), max_visits=4)
    resp, _ = eng.handle("boardsize 5:7")
    assert resp == "="
    resp, _ = eng.handle("play B C3 north")
    assert resp == "="
    resp, _ = eng.handle("genmove white")
    assert resp.startswith("= ")
