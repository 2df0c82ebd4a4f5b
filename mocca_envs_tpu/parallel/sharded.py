"""Sharded batched env stepping over a device mesh.

TPU-native replacement for the subprocess vec-envs the reference ecosystem
used (SURVEY.md §2.4): the env batch is a leading array axis sharded over the
mesh's ``env`` axis. Env stepping is embarrassingly parallel (per-env state,
per-env PRNG streams — core/rng.py), so the compiled step contains zero
collectives; XLA simply partitions it. Collectives appear only at the
learner boundary (harness/ppo.py): ``all_gather`` of observation shards into
the learner sharding and ``psum``/``reduce_scatter`` for gradient sync.

Two composition styles are provided:

- :func:`sharded_env` — ``jit`` + ``NamedSharding`` constraints (GSPMD picks
  the partitioning; best default).
- :func:`shard_mapped_env` — explicit ``shard_map`` (per-shard code, the
  style the PPO harness composes with explicit collectives).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import FnEnv
from mocca_envs_tpu.parallel.mesh import ENV_AXIS, env_sharding


def sharded_init(env: FnEnv, mesh: Mesh, num_envs: int, seed: int = 0):
    """Build a sharded initial state: (B, …) pytree split over the mesh."""
    if num_envs % mesh.size != 0:
        raise ValueError(
            f"num_envs={num_envs} must divide evenly over {mesh.size} devices"
        )
    sh = env_sharding(mesh)
    keys = rng_mod.env_keys(rng_mod.root_key(seed), num_envs)
    init = jax.jit(jax.vmap(env.init), out_shardings=sh)
    return init(keys)


def sharded_env(env: FnEnv, mesh: Mesh):
    """jit-compiled batched step with GSPMD env-axis sharding."""
    sh = env_sharding(mesh)
    step = jax.jit(
        jax.vmap(env.step), in_shardings=(sh, sh), out_shardings=sh, donate_argnums=(0,)
    )
    return step


def shard_mapped_env(env: FnEnv, mesh: Mesh):
    """Explicit per-shard step via shard_map (composable with collectives)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ENV_AXIS), P(ENV_AXIS)),
        out_specs=P(ENV_AXIS),
    )
    def step(state, actions):
        return jax.vmap(env.step)(state, actions)

    return jax.jit(step, donate_argnums=(0,))
