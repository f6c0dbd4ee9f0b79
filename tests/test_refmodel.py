"""Reference ModelDesc import parity: the JAX forward in nn/refmodel.py vs
the repaired reference binary's own Eigen NNEvaluator output.

Fixtures (tests/goldens/refnn/*.json) were produced by
tools/gen_refnn_fixtures.py driving the coffeebridge rawnn command
(refbuild_patches/coffeebridge.cpp) on the repaired reference build with a
random-weights b6c96 net in the reference's own .bin.gz ModelDesc format,
identity symmetry pinned. They capture the POSTPROCESSED NNOutput
(nneval.cpp:700-812): policy probs over legal moves (-1 illegal), value as
a 2-way win/loss softmax flipped to white perspective, varTimeLeft,
shorttermWinlossError, and tanh'd white ownership.

The model file itself is regenerated deterministically from
refbuild_patches/make_model.py (seeded PCG64) rather than committed.
"""

import functools
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN_DIR = REPO / "tests" / "goldens" / "refnn"
FIXTURES = sorted(GOLDEN_DIR.glob("*.json"))


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("refmodel")
    subprocess.run(
        [sys.executable, str(REPO / "refbuild_patches" / "make_model.py")],
        cwd=d,
        check=True,
        capture_output=True,
    )
    return str(d / "models" / "coffee-b6c96-random.bin.gz")


@pytest.fixture(scope="module")
def ref_model(model_path):
    from katacoffee_tpu.nn.refmodel import load_ref_model

    return load_ref_model(model_path)


def test_roundtrip_exact(ref_model, tmp_path):
    """save_ref_model(load_ref_model(f)) reparses to identical weights —
    the export path a finetuned reference-architecture net would take back
    to the reference engine."""
    from katacoffee_tpu.nn.refmodel import load_ref_model, save_ref_model

    out = tmp_path / "rt.bin.gz"
    save_ref_model(ref_model, str(out))
    m2 = load_ref_model(str(out))

    def cmp(a, b, path):
        if isinstance(a, dict):
            assert set(a) == set(b), path
            for k in a:
                cmp(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, list):
            assert len(a) == len(b), path
            for i, (x, y) in enumerate(zip(a, b)):
                cmp(x, y, f"{path}[{i}]")
        elif isinstance(a, np.ndarray):
            assert np.array_equal(a, b), path
        else:
            assert a == b, path

    cmp(ref_model.trunk, m2.trunk, "trunk")
    cmp(ref_model.policy_head, m2.policy_head, "policy_head")
    cmp(ref_model.value_head, m2.value_head, "value_head")
    assert m2.name == ref_model.name and m2.version == ref_model.version


def _replay(cfg, moves):
    from katacoffee_tpu.game.jitted import vstep_fn

    from katacoffee_tpu.game.board import init_state

    step = vstep_fn(cfg)
    st = jax.vmap(lambda i: init_state(cfg))(jnp.arange(1))
    yx = cfg.y_size * cfg.x_size
    for (mx, my, d) in moves:
        a = d * yx + my * cfg.x_size + mx
        st = step(st, jnp.asarray([a]))
    return st


@pytest.mark.parametrize("path", FIXTURES, ids=[p.stem for p in FIXTURES])
def test_forward_parity_vs_reference_binary(path, ref_model):
    """End-to-end: our feature encoder + imported-weights JAX forward + the
    repaired reference's postprocessing == the reference binary's own
    NNEvaluator output, to float32 tolerance, at several board shapes."""
    from katacoffee_tpu.game.board import GameConfig, legal_mask_flat
    from katacoffee_tpu.nn.refmodel import ref_compat_features, ref_forward

    data = json.loads(path.read_text())
    cfg = GameConfig(data["x"], data["y"], data["win_len"])
    A = 4 * cfg.y_size * cfg.x_size

    fwd = jax.jit(
        lambda sp, gl: ref_forward(ref_model, sp, gl)
    )

    for fx in data["fixtures"]:
        st = _replay(cfg, fx["moves"])
        spatial, glob = jax.vmap(functools.partial(ref_compat_features, cfg))(st)
        out = fwd(spatial, glob)
        legal = np.asarray(
            jax.vmap(functools.partial(legal_mask_flat, cfg))(st)
        )[0]

        ref_policy = np.asarray(fx["policy"], np.float32)
        assert ref_policy.shape == (A,)
        # legality itself must agree (-1 = illegal in the reference output)
        assert np.array_equal(legal, ref_policy >= 0.0), fx["moves"]

        logits = np.asarray(out["policy_logits"][0])
        lg = np.where(legal, logits, -np.inf)
        p = np.exp(lg - lg[legal].max())
        p = p / p[legal].sum()
        np.testing.assert_allclose(
            p[legal], ref_policy[legal], rtol=2e-3, atol=2e-6
        )

        # value: 2-way softmax, flipped to white (nneval.cpp:779-808)
        vl = np.asarray(out["value_logits"][0])
        wl = np.exp(vl[:2] - vl[:2].max())
        wl = wl / wl.sum()
        mover_is_white = len(fx["moves"]) % 2 == 1
        white_win = wl[0] if mover_is_white else wl[1]
        np.testing.assert_allclose(white_win, fx["whiteWinProb"], atol=2e-5)
        np.testing.assert_allclose(
            1.0 - white_win, fx["whiteLossProb"], atol=2e-5
        )

        # scorevalue postprocess (nneval.cpp:788-793; multipliers
        # desc.cpp defaults 40.0 / 0.25)
        sv = np.asarray(out["sv"][0])
        var_time = np.logaddexp(0.0, sv[3]) * 40.0
        st_err = np.logaddexp(0.0, sv[4] * 0.5) * 0.5
        np.testing.assert_allclose(var_time, fx["varTimeLeft"], rtol=2e-4)
        np.testing.assert_allclose(
            st_err, fx["shorttermWinlossError"], rtol=2e-4
        )

        # ownership: tanh, flipped to white (nneval.cpp:815-830)
        own = np.tanh(np.asarray(out["ownership"][0]).reshape(-1))
        if not mover_is_white:
            own = -own
        np.testing.assert_allclose(
            own, np.asarray(fx["ownership"], np.float32), atol=2e-5
        )


def test_ref_eval_fn_interface(ref_model):
    """make_ref_eval_fn slots into the search EvalFn contract (policy sums
    to 1 over legal moves, utility in [-1,1], draw forced to 0 exactly as
    the fork's engine does)."""
    from katacoffee_tpu.game.board import GameConfig, init_state
    from katacoffee_tpu.nn.refmodel import make_ref_eval_fn

    cfg = GameConfig(5, 5, 4)
    fn = make_ref_eval_fn(cfg, ref_model)
    st = jax.vmap(lambda i: init_state(cfg))(jnp.arange(3))
    res = jax.jit(fn)(st, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(res.policy.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.abs(np.asarray(res.utility)) <= 1.0)
    assert np.all(np.asarray(res.draw) == 0.0)
    assert np.all(np.asarray(res.shortterm_error) > 0.0)


def test_ref_eval_fn_symmetry_randomize(ref_model):
    """nnRandomize path: policy stays a distribution over legal moves and
    the full-orbit average is symmetry-independent."""
    from katacoffee_tpu.game.board import GameConfig, init_state
    from katacoffee_tpu.nn.refmodel import make_ref_eval_fn

    cfg = GameConfig(5, 5, 4)
    fn = make_ref_eval_fn(cfg, ref_model, symmetry_randomize=True)
    st = jax.vmap(lambda i: init_state(cfg))(jnp.arange(4))
    res = jax.jit(fn)(st, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(res.policy.sum(-1)), 1.0, rtol=1e-5)
