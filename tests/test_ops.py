"""Tests for custom Pallas ops (interpret-mode on CPU; real-hardware numerics
are exercised by bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import katacoffee_tpu.ops.gather as G


def _pallas_interpret(table, idx):
    """Run the kernel under the Pallas interpreter (no TPU needed)."""
    B, N, S = table.shape
    A = idx.shape[1]
    A_pad = -(-A // 128) * 128
    if A_pad != A:
        idx = jnp.pad(idx, ((0, 0), (0, A_pad - A)))
    tb, ca = G._tiling(B, A_pad, N)
    out = pl.pallas_call(
        G._gather_kernel,
        grid=(B // tb, A_pad // ca),
        in_specs=[
            pl.BlockSpec((tb, ca), lambda i, j: (i, j)),
            pl.BlockSpec((tb, N, S), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, ca, S), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, A_pad, S), jnp.float32),
        interpret=True,
    )(idx, table)
    return out[:, :A]


@pytest.mark.parametrize("shape", [(16, 64, 8, 24), (8, 130, 8, 100)])
def test_gather_kernel_matches_einsum(shape):
    B, N, S, A = shape
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (B, N, S))
    idx = jax.random.randint(key, (B, A), 0, N)
    ref = G._gather_rows_xla(table, idx)
    got = _pallas_interpret(table, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_gather_rows_default_path():
    B, N, S, A = 4, 32, 8, 12
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (B, N, S))
    idx = jax.random.randint(key, (B, A), 0, N)
    out = G.gather_rows(table, idx)
    expect = np.stack([np.asarray(table)[b][np.asarray(idx)[b]] for b in range(B)])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_tiling_constraints():
    for B, A_pad, N in ((256, 128, 602), (64, 512, 2048), (8, 128, 100), (4, 128, 64)):
        tb, ca = G._tiling(B, A_pad, N)
        assert B % tb == 0
        assert A_pad % ca == 0
        assert tb % 8 == 0 or tb == B
        assert ca % 128 == 0 or ca == A_pad
