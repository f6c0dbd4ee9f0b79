#!/usr/bin/env python3
"""Prove the save_ref_model EXPORT path against the actual reference binary
with a TRAINED net (VERDICT r4 task 2's precondition: the export half of
nn/refmodel.py had only ever been exercised with random weights).

Loads a .bin.gz (default: the distilled champion), evaluates N positions
through (a) the reference binary's own Eigen NNEvaluator (coffeebridge
rawnn, identity symmetry) and (b) our JAX ref_forward of the same file, and
asserts the postprocessed outputs agree to float32 tolerance — the same
comparison as tests/test_refmodel.py's golden parity, but on the exported
trained net.

Usage: python tools/refnet_export_check.py [model.bin.gz]
Writes artifacts/refnet_distill/export_check.json.
"""
import functools
import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

KATAGO = os.path.join(REPO, "refbuild", "cpp", "katago")
DEFAULT = os.path.join(REPO, ".runs", "refnet_distill", "coffee-b6c96-distilled.bin.gz")


def main(model_path: str):
    import oracle

    import jax

    if os.environ.get("KC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KC_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat
    from katacoffee_tpu.game.jitted import vstep_fn
    from katacoffee_tpu.nn.refmodel import load_ref_model, ref_compat_features, ref_forward

    x, y, winlen = 5, 5, 4
    cfg = GameConfig(x, y, winlen)
    rng = random.Random(424242)

    # positions: initial + random playouts of varying depth
    def random_position(n_moves):
        g = oracle.OracleGame(x, y, winlen)
        moves = []
        for _ in range(n_moves):
            legal = [
                (mx, my, d)
                for mx in range(x) for my in range(y) for d in range(4)
                if g.is_legal(mx, my, d)
            ]
            if not legal or g.done:
                break
            mv = rng.choice(legal)
            g.play(*mv)
            if g.done:
                break
            moves.append(mv)
        return moves

    positions = [[]] + [random_position(rng.randint(1, x * y - 2)) for _ in range(15)]

    cfgpath = "/tmp/export_check_bridge.cfg"
    with open(cfgpath, "w") as f:
        f.write(
            "logDir = /tmp/bridge_logs\nmaxVisits = 10\nnumSearchThreads = 1\n"
            "nnRandomize = false\ndefaultSymmetry = 0\n"
            "nnCacheSizePowerOfTwo = 16\nnnMutexPoolSizePowerOfTwo = 12\n"
            f"lagBuffer = 1.0\nboardXSize = {x}\nboardYSize = {y}\nwinLen = {winlen}\n"
        )
    lines = [
        f"rawnn {x} {y} {winlen} " + " ".join(f"{mx},{my},{d}" for mx, my, d in mv)
        for mv in positions
    ] + ["quit"]
    proc = subprocess.run(
        [KATAGO, "coffeebridge", "-config", cfgpath, "-model", model_path],
        input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=2400,
    )
    outs = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert len(outs) == len(positions), (proc.stdout[-500:], proc.stderr[-1500:])

    ref = load_ref_model(model_path)
    step = vstep_fn(cfg)

    def replay(moves):
        st = jax.vmap(lambda i: init_state(cfg))(jnp.arange(1))
        for (mx, my, d) in moves:
            st = step(st, jnp.asarray([d * y * x + my * x + mx]))
        return st

    fwd = jax.jit(lambda sp, gl: ref_forward(ref, sp, gl))
    max_pol_err = max_val_err = 0.0
    for mv, out_ref in zip(positions, outs):
        assert "error" not in out_ref, (mv, out_ref)
        st = replay(mv)
        spatial, glob = jax.vmap(functools.partial(ref_compat_features, cfg))(st)
        out = fwd(spatial, glob)
        legal = np.asarray(jax.vmap(functools.partial(legal_mask_flat, cfg))(st))[0]
        ref_policy = np.asarray(out_ref["policy"], np.float32)
        assert np.array_equal(legal, ref_policy >= 0.0), mv
        logits = np.asarray(out["policy_logits"][0])
        lg = np.where(legal, logits, -np.inf)
        p = np.exp(lg - lg[legal].max())
        p = p / p[legal].sum()
        max_pol_err = max(max_pol_err, float(np.abs(p[legal] - ref_policy[legal]).max()))
        vl = np.asarray(out["value_logits"][0])
        wl = np.exp(vl[:2] - vl[:2].max())
        wl = wl / wl.sum()
        mover_is_white = len(mv) % 2 == 1
        white_win = wl[0] if mover_is_white else wl[1]
        max_val_err = max(max_val_err, abs(float(white_win) - out_ref["whiteWinProb"]))
    ok = max_pol_err < 2e-3 and max_val_err < 1e-4
    result = dict(
        model=os.path.basename(model_path), positions=len(positions),
        max_policy_abs_err=max_pol_err, max_white_win_abs_err=max_val_err, ok=ok,
    )
    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "artifacts", "refnet_distill"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "refnet_distill", "export_check.json"), "w") as f:
        json.dump(result, f, indent=2)
    assert ok, result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT)
