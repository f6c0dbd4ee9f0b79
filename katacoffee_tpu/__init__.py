"""KataCoffee-TPU: a TPU-native AlphaZero framework for the game Coffee.

A ground-up JAX/XLA/Pallas re-design of the capabilities of kennychenfs/KataCoffee
(a KataGo v1.13.2 fork retargeted to the (5,5,4) connection game "Coffee").

Design stance (see docs/DESIGN.md): the reference's thread-per-game CPU engine with a
batching GPU server is inverted into single jitted programs that step thousands of
games, searches, and NN evaluations in lockstep on-device; multi-chip scaling is via
jax.sharding.Mesh + shard_map collectives rather than NCCL/threads.
"""

__version__ = "0.1.0"
