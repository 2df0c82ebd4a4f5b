"""Mixed multi-family suite — BASELINE.json config 5's env side.

Config 5 is "Mixed suite (Walker3D + Cassie + Monkey3D) sharded across N≥2
hosts feeding a PPO learner". TPU-first shape of that: each family steps as
its OWN compiled sub-batch (its own fused Pallas kernel — NOT a
``lax.switch`` over families, which would compile and execute every family's
physics for every slot), and the families present ONE padded interface to a
single shared learner:

- obs: zero-padded to the widest family, plus a one-hot family tag so the
  shared policy can condition on the task;
- act: zero-padded to the widest family; each env consumes its own prefix.

``MixedSuite`` quacks like the provider ``harness.ppo.PPOLearner`` expects
(``obs_dim``/``act_dim``/``init_states``/``make_rollout``), so the learner
update — GAE, minibatched clipped-surrogate epochs, psum gradient sync over
the mesh — is byte-for-byte the single-family path: the per-family
trajectories are concatenated along the batch axis before learning.

Reference: SURVEY.md §2.4 (parallelism rows), §5.8; the reference itself has
no trainer — config 5 is the benchmark suite's composition.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import FnEnv
from mocca_envs_tpu.harness.rollout import Trajectory, make_batched_rollout


def padded_env(env: FnEnv, family: int, num_families: int,
               obs_dim: int, act_dim: int) -> FnEnv:
    """Wrap a family env to the suite-wide (obs_dim, act_dim) interface."""
    pad_w = obs_dim - num_families - env.obs_dim
    tag = jnp.zeros(num_families).at[family].set(1.0)

    def _pad(obs):
        return jnp.concatenate([obs, jnp.zeros(pad_w, obs.dtype), tag])

    def obs_fn(state):
        return _pad(env.obs_fn(state))

    def step(state, action):
        tr = env.step(state, action[: env.act_dim])
        return tr.replace(obs=_pad(tr.obs))

    def step_no_reset(state, action):
        tr = env.step_no_reset(state, action[: env.act_dim])
        return tr.replace(obs=_pad(tr.obs))

    return FnEnv(
        name=f"{env.name}[padded {family}/{num_families}]",
        obs_dim=obs_dim,
        act_dim=act_dim,
        reset=env.reset,
        step=step,
        step_no_reset=step_no_reset,
        obs_fn=obs_fn,
        control_dt=env.control_dt,
        mirror=None,  # families mirror differently; symmetry loss is per-family
    )


@dataclasses.dataclass(frozen=True)
class MixedSuite:
    """K families + per-family env counts, as a PPOLearner provider."""

    env_ids: tuple
    counts: tuple

    DEFAULT = ("Walker3DCustomEnv-v0", "CassieEnv-v0", "Monkey3DStepperEnv-v0")

    def __post_init__(self):
        assert len(self.env_ids) == len(self.counts) >= 2
        import mocca_envs_tpu

        base = [mocca_envs_tpu.make(e) for e in self.env_ids]
        K = len(base)
        max_obs = max(e.obs_dim for e in base)
        max_act = max(e.act_dim for e in base)
        object.__setattr__(self, "_base", base)
        object.__setattr__(self, "obs_dim", max_obs + K)
        object.__setattr__(self, "act_dim", max_act)
        object.__setattr__(
            self,
            "envs",
            [padded_env(e, f, K, max_obs + K, max_act) for f, e in enumerate(base)],
        )
        object.__setattr__(self, "num_envs", sum(self.counts))
        object.__setattr__(
            self, "name", "Mixed(" + "+".join(self.env_ids) + ")"
        )

    @classmethod
    def default(cls, envs_per_family: int = 1024) -> "MixedSuite":
        return cls(cls.DEFAULT, (envs_per_family,) * len(cls.DEFAULT))

    def init_states(self, seed: int, mesh=None):
        """Per-family sharded env states + padded obs, as pytree tuples."""
        states, obss = [], []
        root = rng_mod.root_key(seed)
        for f, env in enumerate(self.envs):
            keys = rng_mod.env_keys(jax.random.fold_in(root, f), self.counts[f])
            if mesh is not None:
                from mocca_envs_tpu.parallel.mesh import env_sharding

                sh = env_sharding(mesh)
                st = jax.jit(jax.vmap(env.init), out_shardings=sh)(keys)
            else:
                st = jax.jit(jax.vmap(env.init))(keys)
            states.append(st)
            obss.append(jax.jit(jax.vmap(env.obs_fn))(st))
        return tuple(states), tuple(obss)

    def make_rollout(self, horizon: int, policy):
        """K per-family rollouts → one batch-concatenated Trajectory."""
        rollouts = [make_batched_rollout(env, horizon, policy) for env in self.envs]
        K = len(rollouts)

        def rollout(params, env_states, obss, key):
            ks = jax.random.split(key, K + 1)
            new_states, new_obss, trajs = [], [], []
            for f, ro in enumerate(rollouts):
                st, ob, _, traj = ro(params, env_states[f], obss[f], ks[f])
                new_states.append(st)
                new_obss.append(ob)
                trajs.append(traj)
            cat = lambda attr, ax: jnp.concatenate(
                [getattr(t, attr) for t in trajs], axis=ax
            )
            # env_metrics stays None: the families' metric dicts have
            # different keys so they cannot batch-concatenate; per-family
            # channels are available by training the family alone
            traj = Trajectory(
                obs=cat("obs", 1), action=cat("action", 1),
                log_prob=cat("log_prob", 1), value=cat("value", 1),
                reward=cat("reward", 1), done=cat("done", 1),
                last_obs=cat("last_obs", 0),
            )
            return tuple(new_states), tuple(new_obss), ks[K], traj

        return rollout
