"""Model tests: shapes, determinism, batch invariance, gradient flow, and
policy symmetry equivariance via input/output transforms (the role of the
reference's runnnsymmetriestest / runnnbatchingtest, SURVEY.md §4 tier 4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game import GameConfig, init_state, jitted
from katacoffee_tpu.game import symmetry as S
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.features import extract_features
from katacoffee_tpu.nn.model import CoffeeNet, count_params, init_params

CFG = GameConfig(5, 5, 4)


@functools.lru_cache(maxsize=None)
def tiny_model():
    spec = get_model_spec("b1c6")
    model = CoffeeNet(spec, win_len=CFG.win_len)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, s, g: model.apply(p, s, g))
    return model, params, fwd


def batch_features(states_list):
    feats = [extract_features(CFG, s) for s in states_list]
    sp = jnp.stack([f[0] for f in feats])
    gl = jnp.stack([f[1] for f in feats])
    return sp, gl


def test_output_shapes_and_param_count():
    model, params, fwd = tiny_model()
    sp, gl = batch_features([init_state(CFG)] * 3)
    out = fwd(params, sp, gl)
    assert out["policy_logits"].shape == (3, 100)
    assert out["opponent_policy_logits"].shape == (3, 100)
    assert out["optimistic_policy_logits"].shape == (3, 100)
    assert out["value_logits"].shape == (3, 3)
    assert out["var_time_left"].shape == (3,)
    assert out["shortterm_error"].shape == (3,)
    assert out["ownership"].shape == (3, 5, 5)
    assert out["futurepos"].shape == (3, 2, 5, 5)
    assert out["line_logits"].shape == (3, 5, 5, 5)
    assert (np.asarray(out["var_time_left"]) >= 0).all()
    assert (np.asarray(out["shortterm_error"]) >= 0).all()
    assert count_params(params) > 0
    # the flagship must also construct
    spec = get_model_spec("b6c96")
    n = count_params(init_params(CoffeeNet(spec, 4), CFG, jax.random.PRNGKey(1)))
    assert n > 100_000


def test_determinism_and_batch_invariance():
    model, params, fwd = tiny_model()
    jstep = jitted.step_fn(CFG)
    s1 = jstep(init_state(CFG), jnp.asarray(12, jnp.int32))
    s2 = jstep(s1, jnp.asarray(2 * 25 + 7, jnp.int32))
    sp, gl = batch_features([init_state(CFG), s1, s2])
    out_a = fwd(params, sp, gl)
    out_b = fwd(params, sp, gl)
    np.testing.assert_array_equal(
        np.asarray(out_a["policy_logits"]), np.asarray(out_b["policy_logits"])
    )
    # batch invariance: row 1 alone == row 1 of batch, to bf16 trunk
    # precision (XLA may pick different conv algorithms per batch size; the
    # reference's runnnbatchingtest similarly allows fp16-scale drift)
    sp1, gl1 = batch_features([s1])
    out_1 = fwd(params, sp1, gl1)
    np.testing.assert_allclose(
        np.asarray(out_1["policy_logits"][0]),
        np.asarray(out_a["policy_logits"][1]),
        rtol=2e-2,
        atol=2e-3,
    )


def test_policy_symmetry_averaging_consistency():
    """Feeding a symmetrized input and un-symmetrizing the policy output must
    be a well-defined operation (shapes/permutation round trip)."""
    model, params, fwd = tiny_model()
    state = init_state(CFG)
    sp, gl = batch_features([state])
    base = np.asarray(fwd(params, sp, gl)["policy_logits"][0])
    for sym in range(8):
        sp_t = S.apply_features(sym, sp[0])[None]
        out = fwd(params, sp_t, gl)["policy_logits"][0]
        back = np.asarray(S.apply_policy(CFG, S.invert(sym), out))
        # identity symmetry must round-trip exactly
        if sym == 0:
            np.testing.assert_array_equal(back, base)
        assert back.shape == base.shape


def test_gradients_flow():
    model, params, fwd = tiny_model()
    sp, gl = batch_features([init_state(CFG)])

    def loss(p):
        out = model.apply(p, sp, gl)
        return (
            out["policy_logits"].sum()
            + out["value_logits"].sum()
            + out["ownership"].sum()
            + out["line_logits"].sum()
        )

    grads = jax.grad(lambda p: loss(p))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # ReZero alphas start at 0 but must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    alpha_grads = [v for k, v in flat if "alpha" in jax.tree_util.keystr(k)]
    assert alpha_grads and any(float(jnp.abs(g).max()) > 0 for g in alpha_grads)


def test_all_registry_specs_construct():
    """Every named config in the menu (python/modelconfigs.py role) wires
    up: param shapes and every head's output shape validate under
    jax.eval_shape — no compile, so even the large nbt trunks are cheap."""
    from katacoffee_tpu.nn.configs import get_model_spec, model_names

    sp, gl = batch_features([init_state(CFG)])
    for name in model_names():
        model = CoffeeNet(get_model_spec(name), win_len=CFG.win_len)
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sp, gl)
        out = jax.eval_shape(lambda v: model.apply(v, sp, gl), params)
        assert out["policy_logits"].shape == (1, CFG.policy_size), name
        assert out["value_logits"].shape == (1, 3), name
        assert out["ownership"].shape == (1, CFG.y_size, CFG.x_size), name
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
        assert n > 0, name
