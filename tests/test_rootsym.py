"""Root symmetry pruning tests (gtp_example.cfg rootSymmetryPruning)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import symmetry as S
from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat, step
from katacoffee_tpu.search import SearchParams, root_visit_counts, run_search, uniform_eval_fn

CFG = GameConfig(5, 5, 4)
SP = SearchParams(valueWeightExponent=0.0, rootSymmetryPruning=True)


def batched(s, n=2):
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


class TestRootSymmetryPruning:
    def test_empty_board_prunes_to_orbit_representatives(self):
        roots = batched(init_state(CFG))
        tree = jax.jit(
            lambda r, k: run_search(CFG, SP, uniform_eval_fn(CFG), r, 40, k)
        )(roots, jax.random.PRNGKey(0))
        rp = np.asarray(tree.root_prior[0])
        kept = set(np.where(rp >= 0)[0])
        legal = np.asarray(legal_mask_flat(CFG, init_state(CFG)))
        n_legal = int(legal.sum())
        # the empty 5×5 board has all 8 symmetries: orbits shrink the root
        # move set by roughly 8x (fixed points make it a bit more)
        assert len(kept) < n_legal / 4
        # kept moves are exactly the minimal representative of each orbit
        for a in kept:
            orbit = {int(S.apply_action(CFG, s, a)) for s in range(S.NUM_SYMMETRIES) if legal[int(S.apply_action(CFG, s, a))]}
            assert min(orbit) == a
        # every legal move's orbit has a kept representative
        for a in np.where(legal)[0]:
            orbit = {int(S.apply_action(CFG, s, int(a))) for s in range(S.NUM_SYMMETRIES)}
            assert orbit & kept
        # visits only on kept moves
        rv = np.asarray(root_visit_counts(tree))[0]
        assert rv[[a for a in range(CFG.policy_size) if a not in kept]].sum() == 0

    def test_asymmetric_position_not_pruned(self):
        s = init_state(CFG)
        # an asymmetric opening: stones at (x=1,y=2) and (x=1,y=0) break
        # every dihedral symmetry
        s = step(CFG, s, jnp.asarray(0 * 25 + 2 * 5 + 1, jnp.int32))
        s = step(CFG, s, jnp.asarray(1 * 25 + 0 * 5 + 1, jnp.int32))
        roots = batched(s)
        tree = jax.jit(
            lambda r, k: run_search(CFG, SP, uniform_eval_fn(CFG), r, 16, k)
        )(roots, jax.random.PRNGKey(1))
        rp = np.asarray(tree.root_prior[0])
        legal = np.asarray(legal_mask_flat(CFG, s))
        np.testing.assert_array_equal(rp >= 0, legal)

    def test_off_by_default(self):
        sp = SearchParams(valueWeightExponent=0.0)
        assert not sp.rootSymmetryPruning
        roots = batched(init_state(CFG))
        tree = jax.jit(
            lambda r, k: run_search(CFG, sp, uniform_eval_fn(CFG), r, 8, k)
        )(roots, jax.random.PRNGKey(2))
        legal = np.asarray(legal_mask_flat(CFG, init_state(CFG)))
        np.testing.assert_array_equal(np.asarray(tree.root_prior[0]) >= 0, legal)
