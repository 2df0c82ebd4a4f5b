"""Functional environment core.

TPU-native inversion of the reference's env object model (SURVEY.md §1 "key
architectural observation"): where ``mocca_envs/env_base.py::EnvBase`` is a
stateful object owning a Bullet client, here an env *family* is a set of
pure functions over pytree state —

    reset(key, n)        → EnvState            (n-th episode of one stream)
    init(key)            → EnvState            (= reset(key, 0))
    step(state, action)  → Transition          (physics + task + auto-reset)

Batched execution is literally ``vmap``; the registry hands out single-env
functions and :class:`BatchedEnv` / the rollout harness compose them. The
Gym-style host wrapper for single-env debugging lives in envs/gym_wrapper.py.

Seeding contract (reference behavior B9 — ``EnvBase.seed`` → np_random):
``seed int → root key → per-env stream key (fold_in slot) → per-episode key
(fold_in reset_count)``. Same seed ⇒ same stone layouts ⇒ same initial pose
chain, under the documented threefry mapping (core/rng.py).

Auto-reset: a done env is re-initialized *inside* ``step`` (the reference
delegates this to external vec-env wrappers; here it must be in-graph so one
fallen walker doesn't stall 4095 healthy ones). Non-finite state (physics
blow-up) also forces a reset and is counted — the batched-engine form of
elastic recovery (SURVEY.md §5.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import rng as rng_mod


class EnvState(struct.PyTreeNode):
    """Complete per-env state; everything the next step needs."""

    q: jnp.ndarray
    qd: jnp.ndarray
    key: jax.Array            # this env's stream key (constant per slot)
    reset_count: jnp.ndarray  # int32, selects the episode key (B9)
    steps: jnp.ndarray        # int32 steps in current episode
    task: Any                 # task-family pytree (targets, stones, phase…)
    scene: Any                # terrain/scene.Scene (per-env stone layouts)
    done: jnp.ndarray         # bool: last step ended the episode
    blowup_count: jnp.ndarray # int32: forced resets due to non-finite state


class Transition(struct.PyTreeNode):
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    metrics: dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class FnEnv:
    """A compiled-once env family: pure reset/step plus metadata."""

    name: str
    obs_dim: int
    act_dim: int
    # reset(stream_key, reset_count, prev_state=None): ``prev_state`` is the
    # terminating state at auto-reset time, letting families carry dynamic
    # per-env settings (e.g. the stepper's curriculum stage) across episodes
    # without recompiles; None at first init.
    reset: Callable
    step: Callable[[EnvState, jnp.ndarray], Transition]
    # step WITHOUT auto-reset — the parity recorder needs terminal frames
    step_no_reset: Callable[[EnvState, jnp.ndarray], Transition]
    obs_fn: Callable[[EnvState], jnp.ndarray]
    control_dt: float
    mirror: Any = None  # (obs_perm_sign, act_perm, act_sign) when available
    model: Any = None   # RobotModel metadata (FK replay, parity, viewer)
    # obs for the FRESH state at in-graph auto-reset. The full obs_fn
    # re-runs the XLA-path narrowphase for frame-0 contact flags — traced
    # into every scan step for every env, that single subgraph measured
    # 25× the entire fused control step on stone scenes (round-4 3j
    # decomposition: stepper policy rollout 198k vs 6.0M env-steps/s with
    # the reset branch's obs eliminated). Families may provide a cheap
    # variant (e.g. zero contact flags — pybullet reports no contacts
    # before the first stepSimulation, so frame-0 zeros are the
    # reference-parity value); None falls back to obs_fn.
    reset_obs_fn: Callable[[EnvState], jnp.ndarray] | None = None

    def init(self, key: jax.Array) -> EnvState:
        return self.reset(key, jnp.zeros((), jnp.int32))


def _select(done, a, b):
    """tree-wise where(done, a, b) with scalar done broadcast per-leaf."""
    return jax.tree.map(
        lambda x, y: jnp.where(jnp.reshape(done, (1,) * x.ndim) if x.ndim else done, x, y),
        a,
        b,
    )


def make_fn_env(
    *,
    name: str,
    obs_dim: int,
    act_dim: int,
    reset: Callable,
    raw_step: Callable,
    obs_fn: Callable,
    control_dt: float,
    mirror=None,
    model=None,
    reset_obs_fn: Callable | None = None,
) -> FnEnv:
    """Assemble a family: wraps ``raw_step`` with done/NaN auto-reset.

    ``reset_obs_fn`` (optional) computes the fresh state's obs at
    auto-reset instead of ``obs_fn`` — see FnEnv.reset_obs_fn for why.
    """
    fresh_obs = reset_obs_fn or obs_fn

    def step(state: EnvState, action: jnp.ndarray) -> Transition:
        tr = raw_step(state, action)
        finite = (
            jnp.all(jnp.isfinite(tr.state.q))
            & jnp.all(jnp.isfinite(tr.state.qd))
            & jnp.isfinite(tr.reward)
        )
        blowup = ~finite
        done = tr.done | blowup
        reward = jnp.where(finite, tr.reward, -1.0)

        fresh = reset(state.key, state.reset_count + 1, tr.state)
        fresh = fresh.replace(
            blowup_count=state.blowup_count + blowup.astype(jnp.int32)
        )
        next_state = _select(done, fresh, tr.state)
        obs = jnp.where(done, fresh_obs(next_state), tr.obs)
        return Transition(
            state=next_state.replace(done=done),
            obs=obs,
            reward=reward,
            done=done,
            metrics={**tr.metrics, "blowup": blowup.astype(jnp.float32)},
        )

    return FnEnv(
        name=name,
        obs_dim=obs_dim,
        act_dim=act_dim,
        reset=reset,
        step=step,
        step_no_reset=raw_step,
        obs_fn=obs_fn,
        control_dt=control_dt,
        mirror=mirror,
        model=model,
        reset_obs_fn=reset_obs_fn,
    )


class BatchedEnv:
    """Thin convenience wrapper: vmapped init/step with per-env streams.

    The TPU-native replacement for subprocess vec-envs (SURVEY.md §2.4 "DP"
    row): one chip steps the whole batch in lockstep; sharding across chips
    is layered on in parallel/sharded.py.
    """

    def __init__(self, env: FnEnv, num_envs: int, seed: int = 0):
        self.env = env
        self.num_envs = num_envs
        self.seed = seed
        self._init = jax.jit(jax.vmap(env.init))
        self._step = jax.jit(jax.vmap(env.step))

    def init(self) -> EnvState:
        keys = rng_mod.env_keys(rng_mod.root_key(self.seed), self.num_envs)
        return self._init(keys)

    def step(self, state: EnvState, actions: jnp.ndarray) -> Transition:
        return self._step(state, actions)
