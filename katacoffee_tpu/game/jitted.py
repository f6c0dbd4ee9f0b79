"""Per-config cached jitted entry points for the game core, so hosts (tests,
frontends, benchmarks) share one compilation per (config, function) pair."""

from __future__ import annotations

import functools

import jax

from katacoffee_tpu.game import board as B


@functools.lru_cache(maxsize=None)
def step_fn(cfg: B.GameConfig):
    return jax.jit(functools.partial(B.step, cfg))


@functools.lru_cache(maxsize=None)
def legal_mask_fn(cfg: B.GameConfig):
    return jax.jit(functools.partial(B.legal_mask, cfg))


@functools.lru_cache(maxsize=None)
def legal_mask_flat_fn(cfg: B.GameConfig):
    return jax.jit(functools.partial(B.legal_mask_flat, cfg))


@functools.lru_cache(maxsize=None)
def situation_hash_fn(cfg: B.GameConfig):
    return jax.jit(functools.partial(B.situation_hash, cfg))


@functools.lru_cache(maxsize=None)
def vstep_fn(cfg: B.GameConfig):
    return jax.jit(jax.vmap(functools.partial(B.step, cfg)))


@functools.lru_cache(maxsize=None)
def vlegal_mask_flat_fn(cfg: B.GameConfig):
    return jax.jit(jax.vmap(functools.partial(B.legal_mask_flat, cfg)))
