"""Replay buffer — the policy of the reference shuffler (`python/shuffle.py`)
without its file mechanics: a host-side ring of recent training rows with a
sliding window that grows as a tapered power of total data produced
(shuffle.py's windowing formula intent), sampled uniformly.

Rows live as numpy pytrees (the TrainingBatch structure). The actor adds
weight>0 rows; sampling returns device-ready batches.
"""

from __future__ import annotations

import numpy as np
import jax


class ReplayBuffer:
    def __init__(self, capacity: int, seed: int = 0):
        self.capacity = int(capacity)
        self.rng = np.random.RandomState(seed)
        self._store = None  # pytree of np arrays [capacity, ...]
        self.size = 0
        self.head = 0
        self.total_added = 0

    def add(self, batch) -> int:
        """Add rows with weight > 0 from a TrainingBatch pytree. Returns the
        number of rows added."""
        host = jax.tree_util.tree_map(np.asarray, batch)
        keep = host.weight > 0
        n = int(keep.sum())
        if n == 0:
            return 0
        rows = jax.tree_util.tree_map(lambda x: x[keep], host)
        if self._store is None:
            self._store = jax.tree_util.tree_map(
                lambda x: np.zeros((self.capacity,) + x.shape[1:], x.dtype), rows
            )
        idx = (self.head + np.arange(n)) % self.capacity
        jax.tree_util.tree_map(
            lambda store, new: store.__setitem__(idx, new[: len(idx)]),
            self._store,
            rows,
        )
        self.head = int((self.head + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))
        self.total_added += n
        return n

    def window_size(self) -> int:
        """Sampling window: the reference shuffler keeps a window of recent
        rows that scales sublinearly with total rows generated
        (shuffle.py taper). We use min(size, 250k * (total/250k)^0.65)-style
        growth clipped to capacity."""
        base = 25_000
        if self.total_added <= base:
            return self.size
        w = int(base * (self.total_added / base) ** 0.65)
        return max(1, min(self.size, w))

    def sample(self, batch_size: int):
        """Uniform sample from the recent window. Returns a pytree of numpy
        arrays shaped [batch_size, ...]."""
        assert self.size > 0, "empty replay buffer"
        w = self.window_size()
        # newest w rows: positions head-1 ... head-w
        offs = self.rng.randint(0, w, size=batch_size)
        idx = (self.head - 1 - offs) % min(self.size, self.capacity)
        return jax.tree_util.tree_map(lambda x: x[idx], self._store)
