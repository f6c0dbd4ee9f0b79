"""Mesh construction and pytree placement utilities."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize multi-host JAX (jax.distributed over DCN). No-op for a
    single process. Args default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or, on
    TPU pods, to automatic cluster detection. Returns (process_index,
    process_count)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None


def make_data_mesh(num_devices: int | None = None, local: bool = False) -> Mesh:
    """1-D mesh over (up to) all global devices, axis name 'data'. Device
    order follows jax.devices(), which groups by host — so the batch shards
    that land on one host's chips are contiguous and DCN traffic stays off
    the per-step path.

    `local=True` builds the mesh over THIS process's devices only — the
    selfplay-daemon topology: selfplay needs no cross-host communication,
    so each host runs an independent daemon over its own chips at its own
    pace (the reference's per-machine selfplay workers) and only training
    uses the global mesh (psum gradients over DCN)."""
    devices = jax.local_devices() if local else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_leading_axis(mesh: Mesh, tree):
    """Place a pytree with its leading axis sharded over 'data'. Leading
    dims must be divisible by the mesh size. Inputs are the full GLOBAL
    host arrays (every process computes the same ones); when the mesh spans
    other hosts' devices each process contributes the rows its mesh slice
    owns (jax.make_array_from_callback — device_put cannot address other
    hosts' devices). A LOCAL mesh (make_data_mesh(local=True)) is fully
    addressable even multi-process and takes the plain device_put path."""

    def place(x):
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        sharding = NamedSharding(mesh, spec)
        if not sharding.is_fully_addressable:
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx, x=x: x[idx]
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, tree)


def local_rows(tree):
    """Host numpy of THIS process's shard of each leaf (addressable shards
    concatenated along the sharded axis, in shard-index order). The
    multi-host daemon's host-side path: each host finalizes and writes the
    rows its chips generated — the multi-mesh analogue of the reference's
    independent per-machine selfplay workers (SURVEY §2.8 P2/P6). Single
    process, this is just np.asarray."""

    def pull(x):
        if not hasattr(x, "addressable_shards") or getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        # find the sharded axis from the first shard's index slices
        idx = shards[0].index
        axes = [
            i
            for i, sl in enumerate(idx)
            if not (sl.start in (None, 0) and sl.stop in (None, x.shape[i]))
        ]
        if not axes:  # replicated leaf
            return np.asarray(shards[0].data)
        ax = axes[0]
        seen = set()
        parts = []
        for s in shards:
            key = s.index[ax].start
            if key in seen:  # same slice on several local devices
                continue
            seen.add(key)
            parts.append(np.asarray(s.data))
        return np.concatenate(parts, axis=ax)

    return jax.tree_util.tree_map(pull, tree)


def shard_map_batched(mesh: Mesh, fn, batch_size: int | tuple[int, ...],
                      rng_arg_index: int | None = None,
                      time_axis_sizes: tuple[int, ...] = ()):
    """Wrap a batched selfplay/search step in `shard_map` over 'data'.

    The GSPMD partitioner handles our while_loop-heavy search poorly: loop
    carries get resharded every iteration (hundreds of all-gathers; measured
    0.4x per-device retention on the virtual mesh). Manual SPMD runs the
    whole step per shard with NO inserted collectives, and each shard's
    lockstep while_loops gate on the local max visit deficit rather than
    the global one — strictly less padding work.

    Sharding rule per leaf: the first axis whose size is in `batch_size`
    (an int or a tuple — pass side/fork pool capacities too, since their
    per-shard updates diverge and must not be treated as replicated) is
    sharded over 'data'; other leaves (rng keys) are replicated on the way
    in and taken from the local shard on the way out (check_rep=False).
    When `rng_arg_index` is given, that (replicated) key argument is folded
    with the shard index inside the region so shards are decorrelated.

    `time_axis_sizes` disambiguates size collisions: trajectory leaves are
    [T, B, ...], so when T happens to equal a batch/pool size (e.g.
    movesPerSegment == forkPoolCapacity == 64) axis 0 must NOT be sharded —
    any leading axis whose size is in `time_axis_sizes` is skipped when a
    later axis also matches a batch size. A shape assertion after spec
    construction catches any collision this rule cannot resolve.
    """
    from jax.sharding import PartitionSpec

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    sizes = (batch_size,) if isinstance(batch_size, int) else tuple(batch_size)
    tsizes = tuple(time_axis_sizes)

    def spec_for(x) -> PartitionSpec:
        shape = getattr(x, "shape", ())
        matches = [i for i, s in enumerate(shape) if s in sizes]
        # a leading time axis that collides with a batch size defers to a
        # later matching axis ([T, B, ...] trajectories)
        while (
            len(matches) > 1
            and matches[0] < matches[1]
            and shape[matches[0]] in tsizes
        ):
            matches.pop(0)
        if not matches:
            return PartitionSpec()
        if len(matches) > 1:
            raise ValueError(
                f"shard_map_batched: ambiguous batch axis for shape {shape} "
                f"(sizes {sizes}); adjust pool capacities or time_axis_sizes"
            )
        i = matches[0]
        return PartitionSpec(*([None] * i + ["data"]))

    def wrapped(*args):
        in_specs = list(jax.tree_util.tree_map(spec_for, args))
        if rng_arg_index is not None:
            # the key is always replicated (folded per shard inside), even if
            # its shape coincides with a tiny batch size
            in_specs[rng_arg_index] = jax.tree_util.tree_map(
                lambda _: PartitionSpec(), args[rng_arg_index]
            )
        in_specs = tuple(in_specs)
        out_shape = jax.eval_shape(fn, *args)
        out_specs = jax.tree_util.tree_map(spec_for, out_shape)

        def local_fn(*local_args):
            if rng_arg_index is not None:
                local_args = list(local_args)
                local_args[rng_arg_index] = jax.random.fold_in(
                    local_args[rng_arg_index], jax.lax.axis_index("data")
                )
            return fn(*local_args)

        try:  # jax >= 0.8 renamed check_rep -> check_vma
            sm = shard_map(
                local_fn, mesh=mesh,
                in_specs=in_specs, out_specs=out_specs, check_vma=False,
            )
        except TypeError:  # pragma: no cover
            sm = shard_map(
                local_fn, mesh=mesh,
                in_specs=in_specs, out_specs=out_specs, check_rep=False,
            )
        out = sm(*args)

        # safety net: reassembled global shapes must equal the unsharded
        # fn's shapes (catches any spec misassignment loudly at trace time)
        def check(o, e):
            if tuple(o.shape) != tuple(e.shape):
                raise ValueError(
                    f"shard_map_batched: output shape {o.shape} != expected "
                    f"{e.shape} — a batch/time axis size collision; adjust "
                    f"pool capacities or pass time_axis_sizes"
                )

        jax.tree_util.tree_map(check, out, out_shape)
        return out

    return wrapped


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
