"""Seeding and per-env PRNG stream plumbing.

The reference seeds a single NumPy MT19937 stream per env instance via
``gym.utils.seeding.np_random`` (reference behavior B9,
``mocca_envs/env_base.py::EnvBase.seed`` — SURVEY.md §2.2). NumPy MT19937 and
JAX threefry are different generators, so bit-exact RNG parity is impossible;
instead we define and document a deterministic *seed mapping* that the parity
harness (harness/parity.py) treats as part of the trajectory-interchange
contract:

    seed int s          →  root key  = jax.random.key(s)
    env index i (batch) →  env key   = fold_in(root, i)
    reset number n      →  reset key = fold_in(env_key, n)

Every stochastic draw (pose noise, target sampling, stone placement) splits
from the reset key in a fixed, documented order. Same seed → same stone
layout → same initial pose chain, exactly as the reference guarantees, just
under a different (but fixed) generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["root_key", "env_keys", "reset_key", "uniform"]


def root_key(seed: int) -> jax.Array:
    """Map an integer seed to the root PRNG key (the documented seam)."""
    return jax.random.key(seed)


def env_keys(key: jax.Array, num_envs: int) -> jax.Array:
    """Derive one independent stream per env slot in a batch."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(num_envs))


def reset_key(env_key: jax.Array, reset_count: jax.Array) -> jax.Array:
    """Derive the key governing the ``reset_count``-th episode of an env."""
    return jax.random.fold_in(env_key, reset_count)


def uniform(key: jax.Array, shape, lo, hi, dtype=jnp.float32) -> jax.Array:
    """Uniform draw in [lo, hi) — mirrors np_random.uniform call sites."""
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)
