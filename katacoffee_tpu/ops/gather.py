"""Batched row-gather as a Pallas TPU kernel.

The single hottest primitive in the batched MCTS is fetching the packed
stats rows of every child of the current node: `out[b, a] = table[b,
idx[b, a]]` with table [B, N, S] and idx [B, A]. XLA's two lowerings are
both bandwidth-losers on TPU (profiled on real hardware):

  * native gather with [B, A] indices serializes per index (~360µs at
    B=256, N=602, A=100);
  * the one-hot einsum trick (`[B,A,N] @ [B,N,S]`) runs on the MXU but
    MATERIALIZES the [B, A, N] one-hot through HBM, costing B·A·N·4 bytes
    of bandwidth per call — fine at 5×5 sizes (~60MB, ~120µs), ruinous at
    10×10 search sizes (B=256, A=400, N=2048 → 800MB per call).

This kernel builds the one-hot in VMEM tiles only (grid over games ×
action-chunks), so HBM traffic is just table-in + out-out. Profiled
crossover on v5e: XLA einsum wins below ~30M one-hot elements per call,
the kernel wins above; `gather_rows` picks automatically (and always uses
the einsum off-TPU, e.g. in CPU tests)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the one-hot tile, in f32 elements (~9MB incl. headroom for
# the pipelined table/idx/out buffers under the 16MB scoped-vmem limit)
_ONEHOT_TILE_ELEMS = 2_300_000
# below this many one-hot elements per call, XLA's einsum is faster (the
# materialization fits comfortably in HBM bandwidth; kernel grid overheads
# dominate) — measured on v5e
_XLA_EINSUM_MAX_ELEMS = 32 * 1024 * 1024


def _gather_kernel(idx_ref, table_ref, out_ref):
    # idx_ref: [TB, CA] int32; table_ref: [TB, N, S] f32; out_ref: [TB, CA, S]
    tb, ca = idx_ref.shape
    n = table_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, ca, n), 2)
    onehot = (iota == idx_ref[:][:, :, None]).astype(jnp.float32)  # VMEM-only
    out_ref[:] = jax.lax.dot_general(
        onehot,
        table_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _tiling(B: int, A_pad: int, N: int) -> tuple[int, int]:
    """(games-per-tile, actions-per-tile) under the VMEM one-hot budget.
    TPU block constraints: sublane dims divisible by 8 (or the full dim),
    lane dims by 128 (A_pad already is)."""
    tb_candidates = [d for d in range(8, B + 1, 8) if B % d == 0] or [B]
    tb = max(
        (d for d in tb_candidates if d * A_pad * N <= _ONEHOT_TILE_ELEMS),
        default=tb_candidates[0],
    )
    ca = A_pad
    if tb == tb_candidates[0] and tb * ca * N > _ONEHOT_TILE_ELEMS:
        ca = max(128, (_ONEHOT_TILE_ELEMS // (tb * N)) // 128 * 128)
        while A_pad % ca != 0:
            ca -= 128
        ca = max(ca, 128)
    return tb, ca


def _gather_rows_pallas(table: jax.Array, idx: jax.Array) -> jax.Array:
    B, N, S = table.shape
    A = idx.shape[1]
    A_pad = -(-A // 128) * 128
    if A_pad != A:
        idx = jnp.pad(idx, ((0, 0), (0, A_pad - A)))
    tb, ca = _tiling(B, A_pad, N)
    grid = (B // tb, A_pad // ca)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, ca), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, S), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, ca, S), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A_pad, S), jnp.float32),
    )(idx, table)
    return out[:, :A] if A_pad != A else out


def _gather_rows_xla(table: jax.Array, idx: jax.Array) -> jax.Array:
    onehot = jax.nn.one_hot(idx, table.shape[1], dtype=jnp.float32)
    return jnp.einsum("ban,bns->bas", onehot, table)


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def gather_rows(table: jax.Array, idx: jax.Array, use_pallas: bool = False) -> jax.Array:
    """out[b, a, :] = table[b, idx[b, a], :].astype(f32).

    table: [B, N, S] float32, idx: [B, A] int32 with entries in [0, N).
    Out-of-range entries are undefined (callers mask separately).

    Status (measured on v5e, 2026-08): at the 5×5 operating shapes
    (B=256, N≈600, A=100) XLA's one-hot einsum is FASTER than this kernel
    (~120µs vs ~220µs per call — the kernel's VMEM one-hot avoids HBM
    materialization but per-program overheads dominate at these sizes).
    Round-3 in-search A/B at the LARGE-board shapes the kernel was built
    for (tools/pallas_gather_ab.py): the einsum still wins everywhere —
    10×10w5 600-visit selfplay, B=256: 40.5k vs 35.8k visits/s; B=512
    (79M one-hot elems per fetch): 36.4k vs 30.2k. Cause: the grid
    re-DMAs the (tb, N, S) table block once per action-chunk program, so
    table traffic scales with A_pad/ca and outweighs the einsum's one-hot
    materialization at every reachable B·A·N. Tree results are
    bit-identical between paths (the A/B's equivalence check). Kept as a
    tested escape hatch; do not re-attempt as a perf lever without first
    making the table block resident across the action-chunk grid axis.

    Further fusion (PUCT selection math into the kernel) was ANALYZED AND
    REJECTED for these shapes: per-game dynamic node rows either require
    whole-table DMA per level (3×[B,N,A] ≈ 118MB of HBM traffic, far above
    the einsum's 39MB one-hot) or a one-game-per-program grid whose
    per-program overhead (≈3µs × 256) alone exceeds the entire current
    per-level cost (~0.2ms). The selection math after the gather is ~60µs
    of already-fused VPU work — there is no meaningful fusion headroom.
    Opt in with use_pallas=True on TPU."""
    if use_pallas and _on_tpu():
        return _gather_rows_pallas(table, idx)
    return _gather_rows_xla(table, idx)
