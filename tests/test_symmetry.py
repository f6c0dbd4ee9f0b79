"""Symmetry tests: group structure, legal-mask/step/feature equivariance
(the reference pins these via testsymmetries.cpp; ours are property tests)."""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katacoffee_tpu.game import GameConfig, init_state, jitted
from katacoffee_tpu.game import symmetry as S
from katacoffee_tpu.game.board import situation_hash
from katacoffee_tpu.nn.features import extract_features
from tests.oracle import OracleGame

CFG = GameConfig(5, 5, 4)


def random_state(seed, n_moves=6):
    rnd = random.Random(seed)
    g = OracleGame()
    state = init_state(CFG)
    jstep = jitted.step_fn(CFG)
    for _ in range(n_moves):
        if g.done:
            break
        x, y, d = rnd.choice(g.legal_moves())
        g.play(x, y, d)
        state = jstep(state, jnp.asarray(d * 25 + y * 5 + x, jnp.int32))
    return state


def test_group_structure():
    for a in range(8):
        assert S.compose(a, S.invert(a)) == 0
        for b in range(8):
            c = S.compose(a, b)
            assert 0 <= c < 8


def test_dir_perm_cases():
    assert S.dir_perm(0) == (0, 1, 2, 3, 4)
    # pure transpose: N<->W
    assert S.dir_perm(4)[:2] == (1, 0)
    # single flip: NE<->NW
    assert S.dir_perm(1)[2:4] == (3, 2)
    assert S.dir_perm(2)[2:4] == (3, 2)
    # both flips: diagonals unchanged
    assert S.dir_perm(3) == (0, 1, 2, 3, 4)


@pytest.mark.parametrize("sym", range(8))
def test_legal_mask_equivariance(sym):
    jmask = jitted.legal_mask_fn(CFG)
    for seed in range(5):
        state = random_state(seed, n_moves=seed + 2)
        m = jmask(state).astype(jnp.float32).reshape(-1)
        ts = S.apply_state(CFG, sym, state)
        mt = jmask(ts).astype(jnp.float32).reshape(-1)
        np.testing.assert_array_equal(
            np.asarray(S.apply_policy(CFG, sym, m)), np.asarray(mt)
        )


@pytest.mark.parametrize("sym", range(8))
def test_step_equivariance(sym):
    jstep = jitted.step_fn(CFG)
    jmask = jitted.legal_mask_fn(CFG)
    for seed in range(3):
        state = random_state(seed, n_moves=4)
        mask = np.asarray(jmask(state)).reshape(-1)
        legal = np.nonzero(mask)[0]
        if len(legal) == 0:
            continue
        a = jnp.asarray(int(legal[seed % len(legal)]), jnp.int32)
        s1 = jstep(state, a)
        s2 = jstep(S.apply_state(CFG, sym, state), S.apply_action(CFG, sym, a))
        s1t = S.apply_state(CFG, sym, s1)
        np.testing.assert_array_equal(np.asarray(s1t.board), np.asarray(s2.board))
        assert int(s1t.last_spot) == int(s2.last_spot)
        assert int(s1t.last_dir) == int(s2.last_dir)
        assert bool(s1.done) == bool(s2.done)
        assert int(s1.winner) == int(s2.winner)
        np.testing.assert_array_equal(
            np.asarray(s1t.stone_hash), np.asarray(s2.stone_hash)
        )


@pytest.mark.parametrize("sym", range(8))
def test_feature_equivariance(sym):
    feat = jax.jit(functools.partial(extract_features, CFG))
    for seed in range(4):
        state = random_state(seed, n_moves=5)
        sp, gl = feat(state)
        sp_t, gl_t = feat(S.apply_state(CFG, sym, state))
        np.testing.assert_allclose(
            np.asarray(S.apply_features(sym, sp)), np.asarray(sp_t), atol=0
        )
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(gl_t))


def test_situation_hash_changes_under_symmetry():
    # symmetry is not hash-preserving (different positions hash differently)
    state = random_state(1, n_moves=5)
    h0 = np.asarray(situation_hash(CFG, state))
    hs = {tuple(np.asarray(situation_hash(CFG, S.apply_state(CFG, s, state)))) for s in range(8)}
    assert tuple(h0) in hs
    assert len(hs) > 1
