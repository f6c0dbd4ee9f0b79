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


class TestRootMultiSymmetryEval:
    """rootNumSymmetriesToSample (searchparams.h:64, selfplay1.cfg:149)."""

    def test_full_orbit_average_is_exact(self):
        """With k = all 8 symmetries (sampled without replacement), the root
        eval must equal the explicit orbit average of the underlying
        evaluator, for both policy and values."""
        from katacoffee_tpu.search import mcts

        # a deliberately symmetry-breaking evaluator: fixed logits over the
        # action space, value = weighted stone-coordinate sum
        A = CFG.policy_size
        logits0 = jnp.arange(A, dtype=jnp.float32) * 0.03

        def asym_eval(states, rng):
            legal = jax.vmap(functools.partial(legal_mask_flat, CFG))(states)
            lg = jnp.where(legal, logits0[None, :], -jnp.inf)
            pol = jax.nn.softmax(lg, axis=-1)
            pol = jnp.where(legal, pol, 0.0)
            coords = jnp.arange(25, dtype=jnp.float32).reshape(5, 5) / 100.0
            util = (states.board.astype(jnp.float32) * coords).sum((-1, -2))
            b = pol.shape[0]
            return mcts.EvalResult(
                policy=pol,
                utility=util,
                wl=util,
                draw=jnp.zeros((b,)),
                shortterm_error=jnp.full((b,), 0.5),
            )

        # a non-symmetric position: one move played off-center
        s0 = init_state(CFG)
        s1 = step(CFG, s0, jnp.asarray(1))  # direction 0, spot 1
        roots = batched(s1, n=3)

        sp = dataclasses.replace(SP, rootNumSymmetriesToSample=8)
        res = jax.jit(
            lambda st, k: mcts._root_eval(CFG, sp, asym_eval, st, k)
        )(roots, jax.random.PRNGKey(7))

        # explicit orbit average
        accs = []
        for sym in range(S.NUM_SYMMETRIES):
            ts = jax.vmap(lambda st: S.apply_state(CFG, sym, st))(roots)
            r = asym_eval(ts, None)
            pol = jax.vmap(lambda p: S.apply_policy(CFG, S.invert(sym), p))(r.policy)
            accs.append(r._replace(policy=pol))
        want = jax.tree_util.tree_map(
            lambda *xs: sum(xs) / len(xs), *accs
        )
        np.testing.assert_allclose(res.policy, want.policy, atol=1e-5)
        np.testing.assert_allclose(res.utility, want.utility, atol=1e-5)
        np.testing.assert_allclose(res.wl, want.wl, atol=1e-5)

    def test_k1_is_passthrough(self):
        from katacoffee_tpu.search import mcts

        roots = batched(init_state(CFG))
        sp = dataclasses.replace(SP, rootNumSymmetriesToSample=1)
        ev = uniform_eval_fn(CFG)
        res = mcts._root_eval(CFG, sp, ev, roots, jax.random.PRNGKey(0))
        want = ev(roots, jax.random.PRNGKey(0))
        np.testing.assert_allclose(res.policy, want.policy)

    def test_search_runs_with_multi_symmetry_root(self):
        roots = batched(init_state(CFG))
        sp = dataclasses.replace(SP, rootNumSymmetriesToSample=4)
        tree = jax.jit(
            lambda r, k: run_search(CFG, sp, uniform_eval_fn(CFG), r, 30, k)
        )(roots, jax.random.PRNGKey(1))
        v = np.asarray(root_visit_counts(tree)).sum(-1)
        assert (v == 30).all()
