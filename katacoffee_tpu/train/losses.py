"""Training losses — the Coffee-relevant subset of the reference's Metrics
(`python/metrics_pytorch.py`), same weights where kept:

  kept (weight):  policy CE (1.0), opponent-reply policy CE (0.15),
                  value CE (1.20), 3×TD-value CE (1.20), ownership CE (1.5,
                  board-mean), futurepos (0.25), variance-time huber (0.0003),
                  shortterm value error huber ×2.0 vs realized squared error
                  of the short-horizon TD target (metrics_pytorch.py:236-243)
  added:          longest-line per-cell CE (0.5, board-mean) — the Coffee
                  aux target the reference stores (trainingwrite.h:197 C3)
                  but whose torch loss was never written (python stack is
                  un-adapted upstream, SURVEY.md §0)
  dropped (Go-only): scoremean/scorebelief/scorestdev/lead/seki/td-score

Features for each row are re-derived on device from the stored GameState —
cheaper than shipping 18 planes through host memory, and exactly matches what
the actor's search saw.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from katacoffee_tpu.game.board import GameConfig
from katacoffee_tpu.nn.features import extract_features
from katacoffee_tpu.selfplay.actor import TrainingBatch


def _ce(logits, target_probs, axis=-1):
    logp = jax.nn.log_softmax(logits, axis=axis)
    return -(target_probs * logp).sum(axis=axis)


def _huber(pred, target, delta):
    err = pred - target
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * err * err, delta * (a - 0.5 * delta))


def compute_losses(
    cfg: GameConfig,
    model,
    params,
    batch: TrainingBatch,
    symmetrize_rng=None,
    history_mask_rng=None,
    history_keep_prob: float = 0.98,
):
    """Returns (total_loss, metrics dict). If symmetrize_rng is given, applies
    a random dihedral symmetry per row as data augmentation (the reference
    augments in data_processing_pytorch.py:87-126). If history_mask_rng is
    given, each row's visible move history is randomly truncated with the
    reference's chained keep_prob draws (trainingwrite.cpp:438-448 /
    data_processing_pytorch.py:128-201) BEFORE feature derivation, so the net
    stays calibrated on positions set up without history (set_position,
    analysis, startposes). Deviation (docs/DESIGN.md): the draw happens at
    train time per epoch rather than being frozen into the written row —
    strictly more augmentation from the same data."""
    states = batch.states
    if history_mask_rng is not None:
        from katacoffee_tpu.nn.features import (
            mask_history_state,
            sample_history_levels,
        )

        levels = sample_history_levels(
            history_mask_rng, batch.weight.shape[0], history_keep_prob
        )
        states = jax.vmap(mask_history_state)(states, levels)
    spatial, glob = jax.vmap(functools.partial(extract_features, cfg))(states)

    policy_target = batch.policy_target
    opp_target = batch.opponent_policy_target
    ownership = batch.ownership_target
    futurepos = batch.futurepos_target
    lines = batch.line_target

    if symmetrize_rng is not None:
        from katacoffee_tpu.game import symmetry as S

        R = spatial.shape[0]
        nsym = S.num_symmetries(cfg)
        syms = jax.random.randint(symmetrize_rng, (R,), 0, nsym)

        def sym_row(sym, sp_r, pt, opp, own, fut, ln):
            branches = []
            for s in range(nsym):
                branches.append(
                    lambda sp_r, pt, opp, own, fut, ln, s=s: (
                        S.apply_features(s, sp_r),
                        S.apply_policy(cfg, s, pt),
                        S.apply_policy(cfg, s, opp),
                        S.apply_plane(s, own),
                        S.apply_plane(s, fut),
                        S.apply_plane(s, ln),
                    )
                )
            return jax.lax.switch(sym, branches, sp_r, pt, opp, own, fut, ln)

        spatial, policy_target, opp_target, ownership, futurepos, lines = jax.vmap(
            sym_row
        )(syms, spatial, policy_target, opp_target, ownership, futurepos, lines)

    out = model.apply(params, spatial, glob)
    w = batch.weight
    wsum = jnp.maximum(w.sum(), 1e-8)

    def wmean(x, weights=w):
        return (x * weights).sum() / wsum

    # policy CE; rows with all-zero targets contribute 0
    pt_ok = policy_target.sum(-1) > 0
    loss_policy = wmean(jnp.where(pt_ok, _ce(out["policy_logits"], policy_target), 0.0))
    opp_ok = opp_target.sum(-1) > 0
    loss_opp = 0.15 * wmean(
        jnp.where(opp_ok, _ce(out["opponent_policy_logits"], opp_target), 0.0),
        weights=w * batch.opponent_policy_weight,
    )
    # optimistic policy (reference v12+ long+short optimistic heads merged
    # into our single head; metrics_pytorch.py:534-596, Go score terms
    # dropped): train toward the normal policy target but weighted toward
    # rows where the game went surprisingly WELL for the mover — final win
    # squared (draws count half, squaring discourages them), or the
    # shortterm value outcome landing ~1.5 sigma above the net's own
    # prediction. Side rows are excluded (the reference multiplies by the
    # ownership weight, which is 0 there — our aux_weight).
    st_probs = jax.nn.softmax(out["td_value_logits"][:, 2, :], axis=-1)
    st_predv = jax.lax.stop_gradient(st_probs[:, 0] - st_probs[:, 1])
    st_realv = batch.td_value_targets[:, 2, 0] - batch.td_value_targets[:, 2, 1]
    win_eff = batch.value_target[:, 0] + 0.5 * batch.value_target[:, 2]
    excess = (st_realv - st_predv) / jnp.sqrt(
        jax.lax.stop_gradient(jnp.maximum(out["shortterm_error"], 0.0)) + 1e-4
    )
    optimism_w = jnp.clip(
        win_eff * win_eff + jax.nn.sigmoid((excess - 1.5) * 3.0), 0.0, 1.0
    ) * batch.aux_weight
    loss_opt = 0.15 * wmean(
        jnp.where(pt_ok, _ce(out["optimistic_policy_logits"], policy_target), 0.0),
        weights=w * optimism_w,
    )

    loss_value = 1.20 * wmean(_ce(out["value_logits"], batch.value_target))
    loss_td = 1.20 * wmean(
        _ce(out["td_value_logits"], batch.td_value_targets, axis=-1).sum(-1)
    )

    # ownership: single-channel tanh trained as 2-class CE on (own+1)/2
    own_p = (ownership + 1.0) * 0.5
    own_logit = out["ownership"]
    own_ce = -(
        own_p * jax.nn.log_sigmoid(2.0 * own_logit)
        + (1.0 - own_p) * jax.nn.log_sigmoid(-2.0 * own_logit)
    )
    # game-outcome aux targets don't exist for side-position rows
    # (trainingwrite.cpp:134-153 NULL final targets) — aux_weight masks them
    wa = w * batch.aux_weight
    loss_own = 1.5 * wmean(own_ce.mean(axis=(-1, -2)), weights=wa)

    fut_p = (futurepos + 1.0) * 0.5
    fut_logit = out["futurepos"]
    fut_ce = -(
        fut_p * jax.nn.log_sigmoid(2.0 * fut_logit)
        + (1.0 - fut_p) * jax.nn.log_sigmoid(-2.0 * fut_logit)
    )
    # weight the further-out channel less (metrics_pytorch.py:112-128)
    fut_ce = fut_ce[:, 0].mean(axis=(-1, -2)) + 0.6 * fut_ce[:, 1].mean(axis=(-1, -2))
    loss_fut = 0.25 * wmean(fut_ce, weights=wa)

    # longest-line aux: per-cell classification over 0..win_len. One-hot to
    # the HEAD's class count (model.win_len + 1): under mixed-size training
    # (run_training_mixed) one net serves several win_lens, with the head
    # sized for the largest; smaller sizes' targets clip at their own
    # win_len and the surplus classes just receive zero target mass.
    n_classes = out["line_logits"].shape[1]
    line_t = jnp.clip(lines, 0, min(cfg.win_len, n_classes - 1)).astype(jnp.int32)
    line_onehot = jax.nn.one_hot(line_t, n_classes)
    line_ce = _ce(
        jnp.transpose(out["line_logits"], (0, 2, 3, 1)), line_onehot
    ).mean(axis=(-1, -2))
    loss_line = 0.5 * wmean(line_ce, weights=wa)

    loss_vtl = 0.0003 * wmean(
        _huber(out["var_time_left"], batch.var_time_left_target, delta=100.0),
        weights=wa,
    )

    # shortterm value error: huber toward realized squared error of the
    # short-horizon (index 2) TD prediction (metrics_pytorch.py:236-243)
    sqerr = jnp.square(st_predv - st_realv) + 1e-8
    loss_sterr = 2.0 * wmean(
        _huber(out["shortterm_error"], sqerr, delta=0.4), weights=wa
    )

    total = (
        loss_policy
        + loss_opp
        + loss_opt
        + loss_value
        + loss_td
        + loss_own
        + loss_fut
        + loss_line
        + loss_vtl
        + loss_sterr
    )
    metrics = {
        "loss": total,
        "loss_policy": loss_policy,
        "loss_opponent_policy": loss_opp,
        "loss_optimistic_policy": loss_opt,
        "loss_value": loss_value,
        "loss_td_value": loss_td,
        "loss_ownership": loss_own,
        "loss_futurepos": loss_fut,
        "loss_line": loss_line,
        "loss_var_time": loss_vtl,
        "loss_shortterm_error": loss_sterr,
        "policy_acc1": wmean(
            (
                jnp.argmax(out["policy_logits"], -1) == jnp.argmax(policy_target, -1)
            ).astype(jnp.float32)
        ),
        "value_acc1": wmean(
            (
                jnp.argmax(out["value_logits"], -1)
                == jnp.argmax(batch.value_target, -1)
            ).astype(jnp.float32)
        ),
        "weight_sum": w.sum(),
    }
    return total, metrics
