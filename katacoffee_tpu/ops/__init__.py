"""Custom TPU ops (Pallas kernels) for the search hot path."""

from katacoffee_tpu.ops.gather import gather_rows

__all__ = ["gather_rows"]
