"""Rollout generation: ``lax.scan`` over the batched env step.

The long-horizon analog of the checklist's sequence dimension (SURVEY.md
§5.7): rollouts scan over time with donated carry (O(1) memory in horizon
for pure stepping; O(T) only for the trajectory outputs actually requested).
No sequence parallelism exists or is faked — horizon scaling is chunked
scans + host offload of trajectory slices.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.envs.env import EnvState, FnEnv


class Trajectory(struct.PyTreeNode):
    """Time-major (T, B, …) trajectory slices for the learner."""

    obs: jnp.ndarray        # (T, B, obs_dim) obs BEFORE each step
    action: jnp.ndarray     # (T, B, act_dim)
    log_prob: jnp.ndarray   # (T, B)
    value: jnp.ndarray      # (T, B)
    reward: jnp.ndarray     # (T, B)
    done: jnp.ndarray       # (T, B)
    last_obs: jnp.ndarray   # (B, obs_dim) for bootstrap
    # per-step env metric scalars, {name: (T, B)} — surfaced by the learner
    # as batch means and done-masked episode-end means (SURVEY.md §5.5)
    env_metrics: Any = None


def make_batched_rollout(
    env: FnEnv,
    horizon: int,
    policy: Callable,  # policy(params, obs, key) -> (action, log_prob, value)
):
    """Build ``rollout(params, env_state, obs, key) → (env_state, obs, traj)``.

    ``obs`` is carried alongside state so each observation is computed
    exactly once (the env returns post-step obs; recomputing at rollout
    level would double the obs cost at 1M steps/s).
    """
    step = jax.vmap(env.step)

    def rollout(params, env_state: EnvState, obs: jnp.ndarray, key: jax.Array):
        def body(carry, _):
            env_state, obs, key = carry
            key, ka = jax.random.split(key)
            action, log_prob, value = policy(params, obs, ka)
            tr = step(env_state, action)
            out = (obs, action, log_prob, value, tr.reward, tr.done, tr.metrics)
            return (tr.state, tr.obs, key), out

        (env_state, obs, key), outs = jax.lax.scan(
            body, (env_state, obs, key), None, length=horizon
        )
        o, a, lp, v, r, d, m = outs
        traj = Trajectory(
            obs=o, action=a, log_prob=lp, value=v, reward=r, done=d,
            last_obs=obs, env_metrics=m,
        )
        return env_state, obs, key, traj

    return rollout


def random_rollout(env: FnEnv, num_envs: int, horizon: int, seed: int = 0):
    """Random-action rollout — the README smoke loop of the reference
    (SURVEY.md §4 "smoke usage") in batched form; also the bench core."""
    from mocca_envs_tpu.core import rng as rng_mod

    keys = rng_mod.env_keys(rng_mod.root_key(seed), num_envs)
    state = jax.jit(jax.vmap(env.init))(keys)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            actions = jax.random.uniform(
                ka, (num_envs, env.act_dim), minval=-1.0, maxval=1.0
            )
            tr = jax.vmap(env.step)(state, actions)
            return (tr.state, key), tr.reward

        (state, key), rewards = jax.lax.scan(body, (state, key), None, length=horizon)
        return state, rewards

    return run(state, jax.random.key(seed + 1))
