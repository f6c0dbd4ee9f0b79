"""Core utilities: config parsing, logging, Elo computation, seeding.

The TPU-native equivalents of the reference's `cpp/core/` layer (SURVEY.md
§2.7). Only the pieces that still have a job survive: the reference's thread
pools, spinlocks, and waitable queues existed to feed a GPU from CPU threads —
in a lockstep jitted design that machinery has no equivalent.
"""

from katacoffee_tpu.utils.config import ConfigParser, ConfigError
from katacoffee_tpu.utils.logger import Logger
from katacoffee_tpu.utils.elo import compute_elos, EloResult

__all__ = [
    "ConfigParser",
    "ConfigError",
    "Logger",
    "compute_elos",
    "EloResult",
]
