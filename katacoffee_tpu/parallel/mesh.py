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


def make_data_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over (up to) all global devices, axis name 'data'. Device
    order follows jax.devices(), which groups by host — so the batch shards
    that land on one host's chips are contiguous and DCN traffic stays off
    the per-step path."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_leading_axis(mesh: Mesh, tree):
    """Place a pytree with its leading axis sharded over 'data'. Leading
    dims must be divisible by the mesh size."""
    def place(x):
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
