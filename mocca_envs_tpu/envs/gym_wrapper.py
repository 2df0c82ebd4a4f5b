"""Gym-style host wrapper for single-env debugging.

Mirrors the reference's user-facing API (SURVEY.md §2.1 C1/C2:
``env = gym.make("Walker3DCustomEnv-v0"); obs = env.reset();
obs, r, done, info = env.step(a)``) on top of the functional core. This is a
debugging/parity convenience — production stepping is the batched/sharded
path (envs/env.BatchedEnv, parallel/sharded.py).

Rendering: the reference's GUI path (pybullet GUI + keyboard camera —
SURVEY.md §2.1 C2, out of parity scope per §2.3) maps to
``render(mode="state")`` returning a dict of link poses for external
visualizers, and harness/viz.py's trajectory dump.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import FnEnv


class GymEnv:
    """Single-env, host-facing, stateful wrapper (old-gym 4-tuple API)."""

    def __init__(self, env: FnEnv, seed: int = 0, auto_reset: bool = False):
        self._env = env
        self._seed = seed
        self._auto = auto_reset
        self._step = jax.jit(env.step if auto_reset else env.step_no_reset)
        self._reset = jax.jit(env.reset)
        self._state = None
        self._reset_count = 0
        self.observation_space_shape = (env.obs_dim,)
        self.action_space_shape = (env.act_dim,)

    # -- reference API surface -------------------------------------------
    def seed(self, seed: int):
        """Reseed the env stream (reference ``EnvBase.seed``, behavior B9)."""
        self._seed = seed
        self._reset_count = 0
        return [seed]

    def reset(self) -> np.ndarray:
        key = rng_mod.root_key(self._seed)
        self._state = self._reset(key, jnp.asarray(self._reset_count, jnp.int32))
        self._reset_count += 1
        return np.asarray(self._env.obs_fn(self._state))

    def step(self, action):
        tr = self._step(self._state, jnp.asarray(action, dtype=jnp.float32))
        self._state = tr.state
        info = {k: float(v) for k, v in tr.metrics.items()}
        return (
            np.asarray(tr.obs),
            float(tr.reward),
            bool(tr.done),
            info,
        )

    def render(self, mode: str = "state"):
        if mode != "state":
            raise NotImplementedError(
                "GUI rendering is out of scope (SURVEY.md §2.3); use "
                "mode='state' or harness/viz.py trajectory dumps"
            )
        s = self._state
        return {"q": np.asarray(s.q), "qd": np.asarray(s.qd)}

    def close(self):
        self._state = None

    @property
    def state(self):
        return self._state
