"""Selfplay data-generation daemon.

The frontend role of the reference's `cpp/command/selfplay.cpp`: generate
training data continuously, polling for newer nets, writing per-model output
dirs `<base>/selfplay/<model>/{tdata,sgfs}` (selfplay.cpp:33-425) that the
shuffler consumes.

TPU inversion (SURVEY.md §2.8 P2/P3): instead of numGameThreads CPU threads,
ONE jitted program advances B games in lockstep, `moves_per_segment` plies per
device call; data rows come back as arrays and are flushed to npz shards.
Model polling happens between segments (the reference polls every 20s and
swaps nets mid-game, selfplay.cpp:363-384; swapping between segments is the
lockstep analogue — games in flight finish under the new net, which the
reference also allows).
"""

from __future__ import annotations

import dataclasses
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.dataio import TrainingDataWriter, find_latest_model
from katacoffee_tpu.dataio.checkpoints import load_exported_model
from katacoffee_tpu.dataio.sgf import write_sgf
from katacoffee_tpu.game.board import GameConfig, init_state
from katacoffee_tpu.search import SearchParams, make_nn_eval_fn, uniform_eval_fn
from katacoffee_tpu.selfplay import (
    SelfplaySettings,
    Trajectory,
    finalize_targets,
    run_selfplay_segment,
)
from katacoffee_tpu.utils import Logger


def extract_episodes(cfg: GameConfig, traj: Trajectory) -> list[tuple[list, int]]:
    """Complete episodes from a segment as ([(x, y, d, pla)], winner) — for
    SGF output. Episodes that don't finish inside the segment are skipped
    (their data rows are weight-0 too)."""
    played = np.asarray(traj.played_action)  # [T, B]
    done = np.asarray(traj.done_after)
    winner = np.asarray(traj.winner_after)
    ep = np.asarray(traj.episode_id)
    mover = np.asarray(traj.states.to_move)  # [T, B]
    T, B = played.shape
    out = []
    for b in range(B):
        t = 0
        while t < T:
            # find this episode's extent
            e = ep[t, b]
            end = None
            moves = []
            for u in range(t, T):
                if ep[u, b] != e:
                    break
                a = int(played[u, b])
                d, spot = a // cfg.area, a % cfg.area
                moves.append((spot % cfg.x_size, spot // cfg.x_size, d, int(mover[u, b])))
                if done[u, b]:
                    end = u
                    break
            if end is None:
                break  # unfinished tail
            # only full episodes (started inside the segment or at its very
            # beginning with a fresh board == num_turns 0 at first row)
            started_fresh = int(np.asarray(traj.states.num_turns)[t, b]) == 0
            if started_fresh:
                out.append((moves, int(winner[end, b])))
            t = end + 1
    return out


@dataclasses.dataclass
class SelfplayConfig:
    batch_size: int = 256
    num_sims: int = 600  # reference training op-point (selfplay1.cfg:84)
    moves_per_segment: int = 16  # plies per DEVICE CALL (keep calls < ~20s;
    # tunnels/runtimes can watchdog-kill longer executions)
    segments_per_flush: int = 4  # segments concatenated per finalize window:
    # rows of episodes that do not finish inside a window get weight 0, so
    # the window (moves_per_segment × segments_per_flush) should be ≥ 2-3×
    # the typical game length for good data yield
    max_rows_per_file: int = 65536
    poll_every_segments: int = 1
    write_sgfs: bool = True
    max_segments: int | None = None  # None = run forever
    max_rows: int | None = None
    seed: int = 0
    # shard the game batch over all visible devices (P2 at pod scale);
    # the jitted segment then runs SPMD with no cross-game communication
    use_mesh: bool = True
    # start-position SGFs (startPosesFromSgfDir / startPosesProb)
    startposes_dir: str | None = None
    startposes_prob: float = 0.0
    startposes_turn_weight_lambda: float = 0.0
    # side-position forking (sidePositionProb, selfplay1.cfg:58)
    side_position_prob: float = 0.020
    # whole-game forking (earlyForkGameProb/forkGameProb, selfplay1.cfg:26-33)
    early_fork_game_prob: float = 0.040
    fork_game_prob: float = 0.010
    # hint-position SGFs (hintPosesFromSgfDir / hintPosesProb): episodes
    # start at mined positions with the recorded move as rootHintLoc
    hintposes_dir: str | None = None
    hintposes_prob: float = 0.0
    # tree-position recording (recordTreePositions/recordTreeThreshold/
    # recordTreeTargetWeight, playsettings.h:62-64 — default-off like the
    # reference, which has no config key for it at all)
    record_tree_positions: bool = False
    record_tree_threshold: int = 0
    record_tree_target_weight: float = 0.0
    # mixed-board-size runs tag per-size data dirs (tdata_<tag>, sgfs_<tag>)
    # so the shuffler/trainer can bucket by shape (run_mixed_selfplay)
    data_tag: str = ""
    # tree slots per search as a fraction of visits (lockstep capacity
    # knob; binding under tree reuse). 0.3 is quality-gated end-to-end
    # (tools/nodebudget_quality.py: nets trained on 0.3/0.4/0.64-budget
    # data are statistically identical in a 900-game round-robin) and
    # +45% visits/s over 0.64.
    node_budget_frac: float = 0.3


def run_selfplay_daemon(
    base_dir: str,
    cfg: GameConfig,
    sp: SearchParams,
    spc: SelfplayConfig,
    logger: Logger | None = None,
    install_signal_handlers: bool = False,
):
    """Main daemon loop. Returns total rows written.

    With install_signal_handlers (the CLI daemon path), SIGINT/SIGTERM stop
    the loop after the current segment and flush pending data — the
    reference's shutdown flush (selfplay.cpp:22-31,129-132)."""
    logger = logger or Logger(log_to_stdout=True)
    models_dir = os.path.join(base_dir, "models")
    # fold the host index in so multi-host daemons generate distinct games
    # (each host is an independent worker; shard-level decorrelation inside
    # one host comes from shard_map_batched's per-shard fold)
    rng = jax.random.fold_in(jax.random.PRNGKey(spc.seed), jax.process_index())

    stop_requested = {"flag": False}
    if install_signal_handlers:
        import signal

        def _handler(signum, frame):
            logger.write(f"selfplay: signal {signum}, flushing and stopping")
            stop_requested["flag"] = True

        signal.signal(signal.SIGINT, _handler)
        signal.signal(signal.SIGTERM, _handler)

    current_model_dir = None
    eval_fn = uniform_eval_fn(cfg)
    model_name = "random"

    startpos_pool = None
    startposes_prob = 0.0
    if spc.startposes_dir and spc.startposes_prob > 0.0:
        from katacoffee_tpu.selfplay.startposes import load_startposes

        loaded = load_startposes(
            cfg, spc.startposes_dir,
            turn_weight_lambda=spc.startposes_turn_weight_lambda,
        )
        if loaded is not None:
            startpos_pool = (loaded[0], jnp.asarray(loaded[1]))
            startposes_prob = spc.startposes_prob
            logger.write(
                f"selfplay: loaded {loaded[1].shape[0]} start positions "
                f"from {spc.startposes_dir}"
            )
        else:
            logger.write(f"selfplay: no usable start positions in {spc.startposes_dir}")

    hintpos_pool = None
    hintposes_prob = 0.0
    if spc.hintposes_dir and spc.hintposes_prob > 0.0:
        from katacoffee_tpu.selfplay.startposes import load_startposes

        loaded = load_startposes(cfg, spc.hintposes_dir, with_hints=True)
        if loaded is not None:
            hintpos_pool = (loaded[0], jnp.asarray(loaded[1]), jnp.asarray(loaded[2]))
            hintposes_prob = spc.hintposes_prob
            logger.write(
                f"selfplay: loaded {loaded[1].shape[0]} hint positions "
                f"from {spc.hintposes_dir}"
            )
        else:
            logger.write(f"selfplay: no usable hint positions in {spc.hintposes_dir}")

    # selfplay is embarrassingly parallel across hosts: each daemon uses its
    # LOCAL chips (parallel/mesh.py make_data_mesh(local=True)) and hosts
    # coordinate only through the filesystem bus, like the reference's
    # per-machine selfplay workers — no DCN on the per-step path, no
    # cross-host lockstep gating
    n_dev = len(jax.local_devices())
    mesh_active = spc.use_mesh and n_dev > 1 and spc.batch_size % n_dev == 0
    # under the mesh, pool capacities are sharded over devices too (their
    # per-shard updates diverge, parallel/mesh.py shard_map_batched)
    cap_round = (8 * n_dev // math.gcd(8, n_dev)) if mesh_active else 8
    settings = SelfplaySettings(
        num_sims=spc.num_sims,
        node_budget_frac=spc.node_budget_frac,
        startposes_prob=startposes_prob,
        hintposes_prob=hintposes_prob,
        side_position_prob=spc.side_position_prob,
        side_position_capacity=max(
            cap_round * 2,
            -(-int(spc.batch_size * spc.moves_per_segment * spc.side_position_prob * 2)
              // cap_round) * cap_round,
        ),
        early_fork_game_prob=spc.early_fork_game_prob,
        fork_game_prob=spc.fork_game_prob,
        record_tree_positions=spc.record_tree_positions,
        record_tree_threshold=spc.record_tree_threshold,
        record_tree_target_weight=spc.record_tree_target_weight,
    )
    if mesh_active and settings.fork_pool_capacity % cap_round != 0:
        settings = dataclasses.replace(
            settings,
            fork_pool_capacity=-(-settings.fork_pool_capacity // cap_round) * cap_round,
        )
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(spc.batch_size))
    ep = jnp.zeros((spc.batch_size,), jnp.int32)
    mesh = None
    if mesh_active:
        from katacoffee_tpu.parallel import make_data_mesh, shard_leading_axis

        mesh = make_data_mesh(local=True)
        states = shard_leading_axis(mesh, states)
        ep = shard_leading_axis(mesh, ep)
        logger.write(f"selfplay: game batch sharded over {n_dev} local devices (shard_map)")

    segment_fn = None
    writer = None
    sgf_dir = None
    total_rows = 0
    games_done = 0
    seg = 0
    pending_trajs = []
    finalize_fn = jax.jit(lambda t: finalize_targets(cfg, settings, t))
    t_start = time.monotonic()

    side_fn = None
    side_state = None

    # whole-game fork pool (selfplay/forking.py); candidates are extracted on
    # the host at flush time, the NN fork-move choice is one batched device
    # call, and the pool is a traced jit argument (refills don't recompile)
    use_game_forks = settings.early_fork_game_prob > 0.0 or settings.fork_game_prob > 0.0
    fork_pool = None
    fork_fn = None
    fork_np_rng = np.random.default_rng((spc.seed ^ 0x5EEDF04C) + jax.process_index())
    if use_game_forks:
        from katacoffee_tpu.selfplay.forking import init_fork_pool

        fork_pool = init_fork_pool(cfg, settings.fork_pool_capacity)

    def build_for_model():
        nonlocal segment_fn, writer, sgf_dir, side_fn, side_state, fork_fn
        out_base = os.path.join(base_dir, "selfplay", model_name)
        tag = f"_{spc.data_tag}" if spc.data_tag else ""
        tdata = os.path.join(out_base, "tdata" + tag)
        sgf_dir = os.path.join(out_base, "sgfs" + tag)
        os.makedirs(sgf_dir, exist_ok=True)
        writer = TrainingDataWriter(tdata, cfg, spc.max_rows_per_file)
        ev = eval_fn

        def seg_fn(s, e, r, fp=None):
            return run_selfplay_segment(
                cfg, sp, settings, ev, s, e, r, spc.moves_per_segment,
                startpos_pool=startpos_pool, hintpos_pool=hintpos_pool,
                fork_pool=fp,
            )

        def side_fn_raw(ss, t, r):
            from katacoffee_tpu.selfplay import run_side_segment

            return run_side_segment(cfg, sp, settings, ev, ss, t, r)

        def fork_fn_raw(s, v, mc, fo, r):
            from katacoffee_tpu.selfplay.forking import choose_fork_moves

            return choose_fork_moves(
                cfg, ev, s, v, mc, fo, r,
                min_choices=settings.fork_game_min_choices,
                num_lanes=max(
                    settings.early_fork_game_max_choices,
                    settings.fork_game_max_choices,
                ),
            )

        if mesh_active:
            # manual SPMD: the GSPMD partitioner reshards while_loop carries
            # (hundreds of all-gathers, ~0.4x per-device retention measured
            # on the virtual mesh); shard_map runs each shard's lockstep
            # independently with per-shard gating (tools/scaling_bench.py)
            from katacoffee_tpu.parallel import shard_map_batched

            sizes = (
                spc.batch_size,
                settings.side_position_capacity,
                settings.fork_pool_capacity,
            )
            tsizes = (spc.moves_per_segment,)
            segment_fn = jax.jit(shard_map_batched(
                mesh, seg_fn, sizes, rng_arg_index=2, time_axis_sizes=tsizes))
            wrapped_side = shard_map_batched(
                mesh, side_fn_raw, sizes, rng_arg_index=2, time_axis_sizes=tsizes)
            wrapped_fork = shard_map_batched(
                mesh, fork_fn_raw, sizes, rng_arg_index=4, time_axis_sizes=tsizes)
        else:
            segment_fn = jax.jit(seg_fn)
            wrapped_side = side_fn_raw
            wrapped_fork = fork_fn_raw

        if settings.side_position_prob > 0.0:
            from katacoffee_tpu.selfplay import init_side_state

            side_state = init_side_state(cfg, settings.side_position_capacity)
            side_fn = jax.jit(wrapped_side)
        if use_game_forks:
            fork_fn = jax.jit(wrapped_fork)

    def flush_pending():
        nonlocal pending_trajs, total_rows, games_done, fork_pool
        if not pending_trajs:
            return
        merged = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *pending_trajs
        )
        pending_trajs = []
        batch = finalize_fn(merged)
        total_rows += writer.add_batch(batch)
        if settings.record_tree_positions and settings.record_tree_target_weight > 0:
            from katacoffee_tpu.selfplay.treerecord import tree_position_rows

            total_rows += writer.add_batch(tree_position_rows(cfg, settings, merged))
        if use_game_forks and fork_fn is not None:
            from katacoffee_tpu.selfplay.forking import (
                extract_fork_candidates,
                refill_pool,
            )

            cands = extract_fork_candidates(
                cfg, merged, fork_np_rng,
                early_fork_prob=settings.early_fork_game_prob,
                early_fork_move_prop=settings.early_fork_game_expected_move_prop,
                fork_prob=settings.fork_game_prob,
                early_max_choices=settings.early_fork_game_max_choices,
                fork_max_choices=settings.fork_game_max_choices,
            )
            if cands is not None:
                Kf = settings.fork_pool_capacity
                flat_idx, maxcs, forceds = (a[:Kf] for a in cands)
                k = len(flat_idx)
                pad = Kf - k
                cstates = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(
                        np.concatenate(
                            [
                                np.asarray(x).reshape((-1,) + x.shape[2:])[flat_idx],
                                np.broadcast_to(
                                    np.asarray(x).reshape((-1,) + x.shape[2:])[:1],
                                    (pad,) + x.shape[2:],
                                ),
                            ]
                        )
                    ),
                    merged.states,
                )
                cvalid = jnp.asarray(np.arange(Kf) < k)
                cmax = jnp.asarray(np.concatenate([maxcs, np.zeros(pad, np.int32)]))
                cforce = jnp.asarray(np.concatenate([forceds, np.full(pad, -1, np.int32)]))
                fkey = jnp.asarray(fork_np_rng.integers(0, 2**31, size=2, dtype=np.uint32))
                new_forks = fork_fn(cstates, cvalid, cmax, cforce, fkey)
                fork_pool = refill_pool(fork_pool, new_forks)
        if spc.write_sgfs:
            episodes = extract_episodes(cfg, merged)
            games_done += len(episodes)
            for i, (moves, winner) in enumerate(episodes):
                text = write_sgf(
                    cfg.x_size, cfg.y_size, cfg.win_len, moves,
                    model_name, model_name, winner=winner,
                )
                path = os.path.join(sgf_dir, f"seg{seg:06d}_{i:04d}.sgf")
                with open(path, "w") as f:
                    f.write(text + "\n")

    while True:
        if seg % spc.poll_every_segments == 0:
            latest = find_latest_model(models_dir)
            if latest != current_model_dir:
                if writer is not None:
                    # finalize rows generated under the OLD model before the
                    # swap, so they land in the old model's tdata/sgfs dirs
                    # (the reference attributes data to the generating net,
                    # selfplaymanager.h:24)
                    flush_pending()
                    writer.flush()
                current_model_dir = latest
                if latest is None:
                    eval_fn = uniform_eval_fn(cfg)
                    model_name = "random"
                else:
                    model, params, mcfg, meta = load_exported_model(latest)
                    if mcfg != cfg:
                        raise ValueError(f"model {latest} is for {mcfg}, daemon runs {cfg}")
                    # selfplay evals use random-symmetry randomization like
                    # the reference (nnRandomize in selfplay configs)
                    eval_fn = make_nn_eval_fn(cfg, model, params, symmetry_randomize=True)
                    model_name = meta["name"]
                build_for_model()
                logger.write(f"selfplay: using model {model_name}")
        if segment_fn is None:
            build_for_model()

        rng, k = jax.random.split(rng)
        if use_game_forks:
            states, ep, traj, fork_pool = segment_fn(states, ep, k, fork_pool)
        else:
            states, ep, traj = segment_fn(states, ep, k)
        if side_fn is not None:
            # the segment's queued side positions, one extra device call
            rng, k_side = jax.random.split(rng)
            side_state, side_batch = side_fn(side_state, traj, k_side)
            total_rows += writer.add_batch(side_batch)
        pending_trajs.append(jax.tree_util.tree_map(np.asarray, traj))
        seg += 1

        done_now = (
            spc.max_segments is not None and seg >= spc.max_segments
        ) or stop_requested["flag"]
        if len(pending_trajs) >= spc.segments_per_flush or done_now:
            flush_pending()
            dt = time.monotonic() - t_start
            logger.write(
                f"selfplay: seg {seg} rows {total_rows} games {games_done} "
                f"({total_rows / max(dt, 1e-9):.1f} rows/s)"
            )
        if done_now:
            break
        if spc.max_rows is not None and total_rows >= spc.max_rows:
            flush_pending()
            break

    flush_pending()
    writer.flush()
    return total_rows


def run_mixed_selfplay(
    base_dir: str,
    size_configs: list,  # [(GameConfig, rel_prob)]
    sp: SearchParams,
    spc: SelfplayConfig,
    logger: Logger | None = None,
    rows_per_pass: int = 20000,
    max_passes: int | None = 1,
) -> int:
    """Mixed-board-size selfplay — the GameInitializer bSizes role
    (`/root/reference/cpp/program/play.cpp:93-142`; selfplay1.cfg:89
    bSizes/bSizeRelProbs). The reference samples a size per game inside one
    thread pool; lockstep batches need uniform shapes, so sizes run as
    LONG per-size stints (one daemon call per size per pass, row quota
    proportional to its rel prob) into per-size data dirs
    (tdata_<XxYwW>) — one compiled executable per shape, reused across
    passes via the jit cache. Rows carry board_shape, and the shuffler /
    trainer bucket by it (shuffle + run_training_mixed in train.py).

    Note the fork's own mixed-size path is broken: GameInitializer builds
    `Board(xSize, ySize)` (play.cpp:452) which resolves to the
    (size, winLen) ctor, silently making winLen = ySize; our per-size
    GameConfig carries an explicit win_len instead (bWinLens key).
    Returns total rows written across sizes."""
    import dataclasses

    logger = logger or Logger(log_to_stdout=True)
    total_prob = sum(p for _, p in size_configs)
    total_rows = 0
    passes = 0
    while max_passes is None or passes < max_passes:
        for i, (cfg, prob) in enumerate(size_configs):
            quota = max(int(rows_per_pass * prob / total_prob), 1)
            tag = f"{cfg.x_size}x{cfg.y_size}w{cfg.win_len}"
            spc_i = dataclasses.replace(
                spc,
                data_tag=tag,
                max_rows=quota,
                max_segments=None,
                seed=spc.seed + 1009 * passes + 101 * i,
            )
            logger.write(
                f"selfplay-mixed: pass {passes} size {tag} quota {quota} rows"
            )
            total_rows += run_selfplay_daemon(base_dir, cfg, sp, spc_i, logger)
        passes += 1
    return total_rows


def main(argv, **kw):
    """Entry for `katacoffee selfplay` (cli.py plumbs the config)."""
    from katacoffee_tpu.parallel import init_distributed
    from katacoffee_tpu.utils import ConfigParser

    import argparse

    # multi-host: no-op unless JAX_COORDINATOR_ADDRESS etc. are set
    # (tools/launch_2host.sh). Each daemon still runs over its LOCAL chips
    # only (selfplay needs no cross-host comms); initializing the cluster
    # here gives every host a distinct jax.process_index() for seed/name
    # decorrelation and lets a co-located trainer share the rendezvous.
    init_distributed()

    ap = argparse.ArgumentParser(prog="katacoffee selfplay")
    ap.add_argument("-output-dir", required=True)
    ap.add_argument("-config", default=None)
    ap.add_argument("-override-config", default=None)
    args = ap.parse_args(argv)

    c = ConfigParser(args.config, overrides=args.override_config) if args.config else ConfigParser(text="")
    if args.override_config and not args.config:
        c.apply_overrides(args.override_config)
    cfg = GameConfig(
        c.get_int("xSize", 5), c.get_int("ySize", 5), c.get_int("winLen", 4)
    )
    sp = SearchParams.for_selfplay()
    spc = SelfplayConfig(
        batch_size=c.get_int("numParallelGames", 256),
        num_sims=c.get_int("maxVisits", 600),
        moves_per_segment=c.get_int("movesPerSegment", 16),
        segments_per_flush=c.get_int("segmentsPerFlush", 4),
        max_segments=c.get_int("maxSegments", 0) or None,
        max_rows=c.get_int("maxRows", 0) or None,
        seed=c.get_int("seed", 0),
        startposes_dir=c.get_string("startPosesFromSgfDir", "") or None,
        startposes_prob=c.get_float("startPosesProb", 0.0),
        startposes_turn_weight_lambda=c.get_float("startPosesTurnWeightLambda", 0.0),
        side_position_prob=c.get_float("sidePositionProb", 0.020),
        early_fork_game_prob=c.get_float("earlyForkGameProb", 0.040),
        fork_game_prob=c.get_float("forkGameProb", 0.010),
        hintposes_dir=c.get_string("hintPosesFromSgfDir", "") or None,
        hintposes_prob=c.get_float("hintPosesProb", 0.0),
        record_tree_positions=c.get_bool("recordTreePositions", False),
        record_tree_threshold=c.get_int("recordTreeThreshold", 0),
        record_tree_target_weight=c.get_float("recordTreeTargetWeight", 0.0),
        node_budget_frac=c.get_float("nodeBudgetFrac", 0.3),
    )
    logger = Logger(log_to_stdout=True)
    os.makedirs(args.output_dir, exist_ok=True)
    logger.add_file(os.path.join(args.output_dir, "selfplay.log"))
    # bSizes / bSizeRelProbs (play.cpp:93-142) + our explicit bWinLens
    # (the fork's winLen-from-ySize accident documented at
    # run_mixed_selfplay); presence of bSizes switches to the mixed daemon
    if c.contains("bSizes"):
        sizes = [int(s) for s in c.get_string("bSizes").split(",")]
        rel = (
            [float(s) for s in c.get_string("bSizeRelProbs").split(",")]
            if c.contains("bSizeRelProbs")
            else [1.0] * len(sizes)
        )
        winlens = (
            [int(s) for s in c.get_string("bWinLens").split(",")]
            if c.contains("bWinLens")
            else [min(s, 5) for s in sizes]
        )
        if not (len(sizes) == len(rel) == len(winlens)):
            raise ValueError("bSizes, bSizeRelProbs, bWinLens must align")
        size_configs = [
            (GameConfig(s, s, w), p) for s, w, p in zip(sizes, winlens, rel)
        ]
        rows_per_pass = c.get_int("rowsPerPass", 20000)
        # maxPasses=0 (or absent) means run FOREVER — daemon semantics, like
        # the reference selfplay loop which never self-terminates
        # (selfplay.cpp:271-358). Set maxPasses>=1 for a bounded stint.
        max_passes = c.get_int("maxPasses", 0) or None
        c.warn_unused(logger)
        run_mixed_selfplay(
            args.output_dir, size_configs, sp, spc, logger,
            rows_per_pass=rows_per_pass,
            max_passes=max_passes,
        )
        return
    c.warn_unused(logger)
    run_selfplay_daemon(
        args.output_dir, cfg, sp, spc, logger, install_signal_handlers=True
    )
