"""Multi-chip / multi-host parallelism helpers.

The TPU-native replacement for the reference's three comms fabrics
(SURVEY.md §5 "distributed communication backend"):
  * torch DDP over NCCL (gradients)  -> sharding annotations over a
    `jax.sharding.Mesh`; XLA inserts the psum over ICI;
  * filesystem polling between loop processes -> unchanged (the base-dir
    layout works across hosts on a shared filesystem);
  * HTTPS volunteer bus -> katacoffee_tpu/distributed.

Multi-host: `init_distributed()` wraps jax.distributed.initialize (DCN
rendezvous via the standard env vars / TPU metadata); every host then sees
the global device set and the same jitted program runs SPMD. The model here
is data-parallel only by design — the nets are ~4 orders of magnitude below
one-chip capacity, so tp/pp/sp are N/A (SURVEY.md §2.8 P8).
"""

from katacoffee_tpu.parallel.mesh import (
    init_distributed,
    local_rows,
    make_data_mesh,
    shard_leading_axis,
    shard_map_batched,
    replicate,
)

__all__ = [
    "init_distributed",
    "local_rows",
    "make_data_mesh",
    "shard_leading_axis",
    "shard_map_batched",
    "replicate",
]
