#!/usr/bin/env python3
"""Distill the flagship champion into the REFERENCE architecture and export
it as a reference `.bin.gz` (VERDICT r4 task 2: the trained-net
cross-engine strength match needs a SHARP net in the reference's own
ModelDesc format — the random-net matches draw 60% of games, which is
exactly where two PUCT implementations are hardest to tell apart).

Method: nn/refmodel.py's parsed weights are a differentiable pytree; train
them to match the flagship champion CoffeeNet's policy (KL over legal
moves) and 3-way value (CE) on positions drawn from champion-policy-guided
games (temperature 1 with a 10% uniform-legal mix for coverage; finished
games auto-reset). The export half (`save_ref_model`) then writes a
reference-format net that the reference binary can load — proven by the
rawnn parity check in tools/refnet_export_check.py.

Run on the real TPU (ONE TPU process at a time):
    python tools/refnet_distill.py [steps] [batch]
Writes .runs/refnet_distill/coffee-b6c96-distilled.bin.gz and mirrors it to
artifacts/refnet_distill/ with a train-log json.
"""
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, ".runs", "refnet_distill")
ART_DIR = os.path.join(REPO, "artifacts", "refnet_distill")
SRC_MODEL = os.path.join(REPO, "refbuild", "models", "coffee-b6c96-random.bin.gz")


def split_params(struct):
    """Partition a RefModel weight struct into (params pytree of arrays,
    rebuild fn). Non-array leaves (activation kinds, names, block tags) stay
    static."""
    import numpy as np

    leaves, treedef = __import__("jax").tree_util.tree_flatten(struct)
    is_arr = [isinstance(l, np.ndarray) for l in leaves]
    params = [l for l, f in zip(leaves, is_arr) if f]

    def rebuild(new_params):
        it = iter(new_params)
        merged = [next(it) if f else l for l, f in zip(leaves, is_arr)]
        return __import__("jax").tree_util.tree_unflatten(treedef, merged)

    return params, rebuild


def latest_champion():
    d = os.path.join(REPO, "artifacts", "flagship_b6c96", "models")
    models = [m for m in os.listdir(d) if m.startswith("run-s")]
    return os.path.join(d, max(models, key=lambda m: int(m.rsplit("-s", 1)[1])))


def main(steps: int = 3000, batch: int = 256, seed: int = 11,
         champion: str | None = None, out_name: str = "coffee-b6c96-distilled"):
    import jax

    if os.environ.get("KC_PLATFORM"):  # e.g. cpu for smoke tests
        jax.config.update("jax_platforms", os.environ["KC_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    import optax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.game.board import GameConfig, init_state, legal_mask_flat, step
    from katacoffee_tpu.nn.features import extract_features
    from katacoffee_tpu.nn.refmodel import (
        load_ref_model, ref_compat_features, ref_forward, save_ref_model,
    )

    champ_dir = champion or latest_champion()
    if not os.path.isabs(champ_dir):
        champ_dir = os.path.join(REPO, "artifacts", "flagship_b6c96", "models", champ_dir)
    model, cparams, cfg, meta = load_exported_model(champ_dir)
    print(f"champion: {champ_dir} ({meta.get('model')})", flush=True)

    ref = load_ref_model(SRC_MODEL)
    struct = {"trunk": ref.trunk, "policy_head": ref.policy_head, "value_head": ref.value_head}
    params0, rebuild = split_params(struct)
    params0 = [jnp.asarray(p) for p in params0]

    opt = optax.adam(3e-4)
    opt_state = opt.init(params0)

    def ref_fwd(params, states):
        s = ref
        merged = rebuild(params)
        obj = type("M", (), dict(
            version=s.version, trunk=merged["trunk"],
            policy_head=merged["policy_head"], value_head=merged["value_head"],
            post_process=s.post_process,
        ))()
        spatial, glob = jax.vmap(functools.partial(ref_compat_features, cfg))(states)
        return ref_forward(obj, spatial, glob)

    def champ_targets(states):
        spatial, glob = jax.vmap(functools.partial(extract_features, cfg))(states)
        out = model.apply(cparams, spatial, glob)
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)
        lg = jnp.where(legal, out["policy_logits"], -jnp.inf)
        pol = jax.nn.softmax(lg, axis=-1)
        val = jax.nn.softmax(out["value_logits"], axis=-1)  # [win, loss, draw]
        return pol, val, legal

    def loss_fn(params, states, tpol, tval, legal):
        out = ref_fwd(params, states)
        lg = jnp.where(legal, out["policy_logits"], -jnp.inf)
        logp = jax.nn.log_softmax(lg, axis=-1)
        pl = -(jnp.where(legal, tpol * logp, 0.0)).sum(-1).mean()
        vlogp = jax.nn.log_softmax(out["value_logits"], axis=-1)
        vl = -(tval * vlogp).sum(-1).mean()
        return pl + 1.2 * vl, (pl, vl)

    @jax.jit
    def train_step(params, opt_state, states, rng):
        tpol, tval, legal = champ_targets(states)
        (l, (pl, vl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, states, tpol, tval, legal
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # advance the position stream: sample from the champion policy with
        # a 10% uniform-legal mix; auto-reset finished games
        k1, rng = jax.random.split(rng)
        nlegal = legal.sum(-1, keepdims=True)
        mix = 0.9 * tpol + 0.1 * jnp.where(legal, 1.0 / jnp.maximum(nlegal, 1), 0.0)
        acts = jax.random.categorical(k1, jnp.log(jnp.maximum(mix, 1e-30)), axis=-1)
        acts = jnp.where(states.done, 0, acts)
        nxt = jax.vmap(functools.partial(step, cfg))(states, acts)
        fresh = jax.vmap(lambda _: init_state(cfg))(jnp.arange(states.board.shape[0]))
        nxt = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(nxt.done, (-1,) + (1,) * (a.ndim - 1)), b, a
            ),
            nxt, fresh,
        )
        return params, opt_state, nxt, rng, l, pl, vl

    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(batch))
    rng = jax.random.PRNGKey(seed)
    params = params0
    log = []
    t0 = time.time()
    for i in range(steps):
        params, opt_state, states, rng, l, pl, vl = train_step(
            params, opt_state, states, rng
        )
        if i % 200 == 0 or i == steps - 1:
            row = dict(step=i, loss=float(l), policy_kl_ce=float(pl), value_ce=float(vl),
                       wall=round(time.time() - t0, 1))
            log.append(row)
            print(row, flush=True)

    # final agreement metric on a fresh stream
    tpol, tval, legal = jax.jit(champ_targets)(states)
    out = jax.jit(lambda p, s: ref_fwd(p, s))(params, states)
    lg = np.where(np.asarray(legal), np.asarray(out["policy_logits"]), -np.inf)
    top1 = float(
        (np.argmax(lg, -1) == np.argmax(np.where(np.asarray(legal), np.asarray(tpol), -1.0), -1)).mean()
    )
    print("top1 agreement with champion:", top1, flush=True)

    merged = jax.tree_util.tree_map(np.asarray, rebuild([np.asarray(p) for p in params]))
    ref.trunk = merged["trunk"]
    ref.policy_head = merged["policy_head"]
    ref.value_head = merged["value_head"]
    ref.name = out_name
    os.makedirs(OUT_DIR, exist_ok=True)
    out_path = os.path.join(OUT_DIR, out_name + ".bin.gz")
    save_ref_model(ref, out_path)
    os.makedirs(ART_DIR, exist_ok=True)
    import shutil

    shutil.copy2(out_path, os.path.join(ART_DIR, out_name + ".bin.gz"))
    with open(os.path.join(ART_DIR, f"distill_log_{out_name}.json"), "w") as f:
        json.dump(
            dict(champion=os.path.basename(champ_dir), steps=steps, batch=batch,
                 top1_agreement=top1, log=log),
            f, indent=2,
        )
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main(
        steps=int(sys.argv[1]) if len(sys.argv) > 1 else 3000,
        batch=int(sys.argv[2]) if len(sys.argv) > 2 else 256,
        champion=sys.argv[3] if len(sys.argv) > 3 else None,
        out_name=sys.argv[4] if len(sys.argv) > 4 else "coffee-b6c96-distilled",
    )
