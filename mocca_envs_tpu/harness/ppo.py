"""PPO learner over sharded env batches — BASELINE.json config 5's harness.

The reference ships no trainer (SURVEY.md §1: training lived in sibling
repos consuming the Gym API); the benchmark suite nevertheless requires a
learner fed by sharded envs over ICI collectives. Design (SURVEY.md §2.4,
§5.8):

- env batch sharded over the mesh ``env`` axis; rollout is collective-free;
- actor-critic params REPLICATED; every shard computes gradients on its
  local trajectory slice and gradients are ``psum``-averaged over ICI —
  plain DP gradient sync, the only collective the workload warrants (no
  TP/PP/SP is faked: the MLP is tiny, SURVEY.md §2.4);
- advantage statistics are also globally psum-reduced so normalization is
  batch-size invariant;
- the whole update (rollout → GAE → minibatched clipped-surrogate epochs)
  is ONE jitted shard_map program with donated carry.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import FnEnv
from mocca_envs_tpu.harness.rollout import Trajectory, make_batched_rollout
from mocca_envs_tpu.parallel.mesh import ENV_AXIS, env_mesh, env_sharding


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    horizon: int = 128
    num_epochs: int = 4
    num_minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    hidden: tuple = (256, 256)
    # running observation normalization (globally psum-merged across shards)
    # — the walker obs mix scales from ±0.05 potentials to ±10 velocities;
    # without it the critic cannot fit the return scale
    normalize_obs: bool = True
    # learner-side reward scaling (env rewards untouched; the reference
    # ecosystem's trainers scaled rewards similarly)
    reward_scale: float = 1.0
    # ALLSTEPS mirror-symmetry loss (paper §4 / SURVEY.md §3.5): penalize
    # ||π(M_obs(s)) − M_act(π(s))||² so gaits stay left/right symmetric.
    # Consumes the env's mirror_spec; 0 disables (and costs nothing).
    mirror_coef: float = 0.0
    # Exploration floor: the state-independent log_std is clamped here
    # before sampling/likelihood/entropy. With ent_coef=0 PPO otherwise
    # shrinks std without bound once a local optimum (e.g. standing still)
    # pays better than exploring — by transfer time the policy can no longer
    # discover a new task's rewards. −2.0 keeps σ ≥ 0.135.
    log_std_min: float = -2.0
    # Floor SCHEDULE: when log_std_anneal_updates > 0, the effective floor
    # interpolates linearly from log_std_min to log_std_min_final over that
    # many updates, then holds. Subsumes the hand-run two-phase recipe
    # (explore at −1.0 → fine-tune at −2.0): high early noise forces
    # dynamically-stable gaits, the slow anneal lets the policy sharpen
    # without the cliff that collapsed the round-2d continuation. The floor
    # is dynamic data (update_count-driven) — no recompile per change.
    log_std_min_final: float | None = None
    log_std_anneal_updates: int = 0
    # LR SCHEDULE: linear ``lr → lr_final`` over ``lr_anneal_updates`` PPO
    # updates, then hold. The schedule keys off the optimizer step count in
    # opt_state (each PPO update runs num_epochs·num_minibatches optimizer
    # steps — the conversion happens in __init__), so it checkpoints/resumes
    # for free with the optimizer state.
    lr_final: float | None = None
    lr_anneal_updates: int = 0
    # Running REWARD normalization ("value-norm"): scale rewards by the
    # running std of the per-env discounted return before GAE, so the critic
    # target keeps unit-ish scale as rewards grow over training. Subsumes the
    # hand-tuned ``reward_scale`` (both compose; metrics always report RAW
    # reward). State (per-env return accumulator + running var) lives in
    # TrainState only when enabled, so old checkpoints restore unchanged.
    normalize_reward: bool = False
    # Minibatch shuffle mode. "full": per-epoch uniform permutation of all
    # horizon·num_envs samples — statistically exact, but on TPU the
    # ``x[perm]`` gather fetches ~obs_dim floats per sample (the same
    # scalarizing-gather pathology as the stone cull, see ROADMAP perf
    # notes) and at 128×4096 samples it re-reads the whole rollout buffer
    # at gather speed 4× per update. "time": permute only the horizon axis
    # (128 CONTIGUOUS rows of num_envs·dim — a pure-bandwidth gather) so a
    # minibatch is (horizon/num_minibatches) random timesteps × ALL envs;
    # with thousands of INDEPENDENT envs per shard the within-minibatch
    # correlation this introduces is only the weak across-env same-t
    # coupling. Keyed per epoch either way.
    shuffle_mode: str = "full"


class RunningNorm(struct.PyTreeNode):
    """Welford running mean/var over observation dims."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def init(cls, dim: int) -> "RunningNorm":
        return cls(
            mean=jnp.zeros(dim), var=jnp.ones(dim), count=jnp.asarray(1e-4)
        )

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(
            (x - self.mean) / jnp.sqrt(self.var + 1e-8), -10.0, 10.0
        )

    def update(self, bmean, bvar, bcount) -> "RunningNorm":
        delta = bmean - self.mean
        tot = self.count + bcount
        mean = self.mean + delta * (bcount / tot)
        m_a = self.var * self.count
        m_b = bvar * bcount
        m2 = m_a + m_b + jnp.square(delta) * (self.count * bcount / tot)
        return RunningNorm(mean=mean, var=m2 / tot, count=tot)


class ActorCritic(nn.Module):
    """Tanh-MLP Gaussian policy + value head (ALLSTEPS-style capacity)."""

    act_dim: int
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        mean = nn.Dense(self.act_dim, kernel_init=nn.initializers.orthogonal(0.01))(x)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.act_dim,)
        )
        v = x
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(v)
        return mean, log_std, jnp.squeeze(value, -1)


def _gaussian_sample(mean, log_std, key):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    action = mean + std * eps
    log_prob = jnp.sum(
        -0.5 * jnp.square(eps) - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1
    )
    return action, log_prob


def _gaussian_log_prob(mean, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * jnp.square(z) - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    env_state: Any
    obs: jnp.ndarray
    key: jax.Array
    update_count: jnp.ndarray
    obs_norm: RunningNorm
    # populated only when PPOConfig.normalize_reward (None keeps the pytree
    # structure of pre-existing checkpoints intact)
    ret_accum: Any = None   # (B,) per-env discounted-return accumulator
    ret_norm: Any = None    # RunningNorm over the scalar return


def discounted_return_scan(reward, done, accum, gamma):
    """R_t = γ·R_{t−1}·(1−done_{t−1-ish}) + r_t over a (T, B) slice.

    The accumulator resets AFTER a step that ends an episode (done applies
    to the step that produced ``reward``, so the reset gates the NEXT
    accumulation). Returns the (T, B) running returns and the carried (B,)
    accumulator for the next rollout.
    """

    def body(acc, xs):
        r, d = xs
        acc = gamma * acc + r
        ret = acc
        acc = acc * (1.0 - d.astype(acc.dtype))
        return acc, ret

    accum, rets = jax.lax.scan(body, accum, (reward, done))
    return rets, accum


def gae(traj: Trajectory, last_value, gamma, lam):
    """Generalized advantage estimation, reverse scan over time."""

    def body(carry, xs):
        next_adv, next_value = carry
        reward, done, value = xs
        nonterm = 1.0 - done.astype(value.dtype)
        delta = reward + gamma * next_value * nonterm - value
        adv = delta + gamma * lam * nonterm * next_adv
        return (adv, value), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (traj.reward, traj.done, traj.value),
        reverse=True,
    )
    return advs, advs + traj.value


class PPOLearner:
    """Compiled PPO: ``train_step(state) → (state, metrics)``.

    With a mesh, the update runs as one shard_map program (env-sharded
    rollout, psum-averaged gradients); without, a single-device jit.
    """

    def __init__(
        self,
        env: FnEnv,
        config: PPOConfig = PPOConfig(),
        mesh: Mesh | None = None,
        num_envs: int = 1024,
    ):
        # ``env`` may be a single FnEnv or a rollout PROVIDER (harness.mixed.
        # MixedSuite): anything with obs_dim/act_dim + init_states/make_rollout.
        # The learner math below is identical either way.
        self._provider = hasattr(env, "init_states") and hasattr(env, "make_rollout")
        if self._provider:
            num_envs = env.num_envs
        if num_envs % (config.num_minibatches) != 0:
            raise ValueError("num_envs must divide into minibatches")
        if config.shuffle_mode not in ("full", "time"):
            raise ValueError(f"unknown shuffle_mode {config.shuffle_mode!r}")
        if (config.shuffle_mode == "time"
                and config.horizon % config.num_minibatches != 0):
            raise ValueError(
                "shuffle_mode='time' slices minibatches along the horizon — "
                f"horizon {config.horizon} must divide into "
                f"{config.num_minibatches} minibatches"
            )
        if mesh is not None and num_envs % (mesh.size * config.num_minibatches) != 0:
            raise ValueError(
                "num_envs must divide over devices × minibatches"
            )
        if self._provider and mesh is not None:
            for c in env.counts:
                if c % mesh.size != 0:
                    raise ValueError(
                        f"family count {c} must divide over {mesh.size} devices"
                    )
        self.env = env
        self.config = config
        self.mesh = mesh
        self.num_envs = num_envs
        self.mirror = getattr(env, "mirror", None)
        if config.mirror_coef > 0.0 and self.mirror is None:
            raise ValueError(f"{env.name} has no mirror spec for mirror_coef")
        # Mirror maps as signed one-hot MATRICES (m_x = x @ A), not index
        # gathers. ``x[:, perm] * sign`` differentiates through a gather
        # whose backward is a TPU scatter-add, and both directions fall off
        # the vector units (the repo-wide no-gather rule, ROADMAP perf
        # notes); as a (d, d) one-hot matmul at HIGHEST precision the op is
        # exact (rows are ±1·one value) and rides the MXU both ways.
        self._mir_mats = None
        if config.mirror_coef > 0.0:
            import numpy as np

            def _mat(perm, sign):
                d = len(perm)
                A = np.zeros((d, d), np.float32)
                A[np.asarray(perm), np.arange(d)] = np.asarray(
                    sign, np.float32
                )
                return jnp.asarray(A)

            m = self.mirror
            if m.get("family"):
                self._mir_mats = {
                    "obs": [_mat(p, s) for p, s in
                            zip(m["obs_perms"], m["obs_signs"])],
                    "act": [_mat(p, s) for p, s in
                            zip(m["act_perms"], m["act_signs"])],
                }
            else:
                self._mir_mats = {
                    "obs": _mat(m["obs_perm"], m["obs_sign"]),
                    "act": _mat(m["act_perm"], m["act_sign"]),
                }
        self.net = ActorCritic(env.act_dim, config.hidden)
        if (config.lr_final is not None) != (config.lr_anneal_updates > 0):
            raise ValueError(
                "lr_final and lr_anneal_updates must be set together "
                f"(got lr_final={config.lr_final}, "
                f"lr_anneal_updates={config.lr_anneal_updates}); passing "
                "only one would silently run a constant LR"
            )
        if config.lr_final is not None and config.lr_anneal_updates > 0:
            lr = optax.linear_schedule(
                config.lr,
                config.lr_final,
                # optimizer steps per PPO update
                config.lr_anneal_updates
                * config.num_epochs
                * config.num_minibatches,
            )
        else:
            lr = config.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr),
        )
        self._build()

    # ------------------------------------------------------------------ init
    def init(self, seed: int = 0) -> TrainState:
        key = jax.random.key(seed)
        kp, _ = jax.random.split(key)
        obs0 = jnp.zeros((1, self.env.obs_dim))
        params = self.net.init(kp, obs0)
        opt_state = self.tx.init(params)
        if self._provider:
            env_state, obs = self.env.init_states(seed, self.mesh)
        else:
            keys = rng_mod.env_keys(rng_mod.root_key(seed), self.num_envs)
            if self.mesh is not None:
                sh = env_sharding(self.mesh)
                env_state = jax.jit(jax.vmap(self.env.init), out_shardings=sh)(keys)
            else:
                env_state = jax.jit(jax.vmap(self.env.init))(keys)
            obs = jax.jit(jax.vmap(self.env.obs_fn))(env_state)
        return TrainState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            key=key,
            update_count=jnp.zeros((), jnp.int32),
            obs_norm=RunningNorm.init(self.env.obs_dim),
            ret_accum=(
                jnp.zeros((self.num_envs,))
                if self.config.normalize_reward else None
            ),
            ret_norm=(
                RunningNorm.init(1) if self.config.normalize_reward else None
            ),
        )

    # ----------------------------------------------------------------- build
    def _build(self):
        cfg = self.config
        env = self.env
        net = self.net
        tx = self.tx
        n_shards = 1 if self.mesh is None else self.mesh.size
        local_envs = self.num_envs // n_shards

        def _maybe_norm(norm, obs):
            return norm.normalize(obs) if cfg.normalize_obs else obs

        def _floor_of(update_count):
            """Effective log-std floor at this update (scalar, traced)."""
            if cfg.log_std_anneal_updates <= 0 or cfg.log_std_min_final is None:
                return jnp.asarray(cfg.log_std_min, jnp.float32)
            frac = jnp.clip(
                update_count.astype(jnp.float32) / cfg.log_std_anneal_updates,
                0.0, 1.0,
            )
            return cfg.log_std_min + frac * (cfg.log_std_min_final - cfg.log_std_min)

        def policy(params_and_norm, obs, key):
            params, norm, floor = params_and_norm
            mean, log_std, value = net.apply(params, _maybe_norm(norm, obs))
            log_std = jnp.maximum(log_std, floor)
            action, log_prob = _gaussian_sample(mean, log_std, key)
            return action, log_prob, value

        if self._provider:
            rollout = env.make_rollout(cfg.horizon, policy)
        else:
            rollout = make_batched_rollout(env, cfg.horizon, policy)

        def pmean(x):
            if self.mesh is None:
                return x
            return jax.lax.pmean(x, ENV_AXIS)

        def loss_fn(params, mb, adv_stats, norm, floor):
            obs, action, old_lp, old_v, adv, ret = mb
            mean, log_std, value = net.apply(params, _maybe_norm(norm, obs))
            log_std = jnp.maximum(log_std, floor)
            adv_mean, adv_std = adv_stats
            adv_n = (adv - adv_mean) / (adv_std + 1e-8)
            lp = _gaussian_log_prob(mean, log_std, action)
            ratio = jnp.exp(lp - old_lp)
            s1 = ratio * adv_n
            s2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
            pg_loss = -jnp.mean(jnp.minimum(s1, s2))
            v_clipped = old_v + jnp.clip(value - old_v, -cfg.clip_eps, cfg.clip_eps)
            v_loss = 0.5 * jnp.mean(
                jnp.maximum(jnp.square(value - ret), jnp.square(v_clipped - ret))
            )
            entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
            if cfg.mirror_coef > 0.0:
                m = self.mirror
                # π(M_obs(s)) vs M_act(π(s)). The running obs-normalizer is
                # applied to mirrored obs with UNmirrored stats — the stats
                # symmetrize as the gait does, and the loss needs only
                # consistency, not exactness.
                hp = jax.lax.Precision.HIGHEST
                if m.get("family"):
                    # MixedSuite: per-family maps, selected per ROW via the
                    # one-hot family tag in the obs tail (harness/mixed).
                    # Families without a spec carry the identity — zero
                    # residual rows, so the loss is active exactly where a
                    # mirror exists (VERDICT r2 weak #3).
                    Kf = int(m["num_families"])
                    tag = obs[:, -Kf:]
                    m_obs_f = jnp.stack(
                        [jnp.matmul(obs, self._mir_mats["obs"][f],
                                    precision=hp)
                         for f in range(Kf)]
                    )                                       # (K, mb, obs)
                    m_obs = jnp.einsum("bf,fbd->bd", tag, m_obs_f)
                    tgt_f = jnp.stack(
                        [jnp.matmul(mean, self._mir_mats["act"][f],
                                    precision=hp)
                         for f in range(Kf)]
                    )
                    tgt_mean = jnp.einsum("bf,fbd->bd", tag, tgt_f)
                else:
                    m_obs = jnp.matmul(obs, self._mir_mats["obs"],
                                       precision=hp)
                    tgt_mean = jnp.matmul(mean, self._mir_mats["act"],
                                          precision=hp)
                m_mean, _, _ = net.apply(params, _maybe_norm(norm, m_obs))
                msl = jnp.mean(jnp.square(m_mean - tgt_mean))
                loss = loss + cfg.mirror_coef * msl
            return loss, (pg_loss, v_loss, entropy)

        def update_shard(params, opt_state, norm, env_state, obs, key, shard_key,
                         floor, ret_accum, ret_norm):
            env_state, obs, key, traj = rollout(
                (params, norm, floor), env_state, obs, key
            )
            _, _, last_value = net.apply(params, _maybe_norm(norm, traj.last_obs))
            raw_reward_mean = pmean(jnp.mean(traj.reward))
            if cfg.reward_scale != 1.0:
                traj = traj.replace(reward=traj.reward * cfg.reward_scale)
            if cfg.normalize_reward:
                rets, ret_accum = discounted_return_scan(
                    traj.reward, traj.done, ret_accum, cfg.gamma
                )
                rmean = pmean(jnp.mean(rets))
                rvar = pmean(jnp.mean(jnp.square(rets - rmean)))
                ret_norm = ret_norm.update(
                    rmean[None], rvar[None],
                    jnp.asarray(cfg.horizon * local_envs * n_shards, jnp.float32),
                )
                # scale-only (no mean shift — reward sign must survive), like
                # the classic VecNormalize reward wrapper
                rstd = jnp.sqrt(ret_norm.var[0] + 1e-8)
                traj = traj.replace(
                    reward=jnp.clip(traj.reward / rstd, -10.0, 10.0)
                )
            adv, ret = gae(traj, last_value, cfg.gamma, cfg.gae_lambda)

            if cfg.normalize_obs:
                flat_obs = traj.obs.reshape(-1, traj.obs.shape[-1])
                bmean = pmean(jnp.mean(flat_obs, axis=0))
                bvar = pmean(jnp.mean(jnp.square(flat_obs - bmean), axis=0))
                bcount = jnp.asarray(
                    cfg.horizon * local_envs * n_shards, jnp.float32
                )
                new_norm = norm.update(bmean, bvar, bcount)
            else:
                new_norm = norm

            adv_mean = pmean(jnp.mean(adv))
            adv_sq = pmean(jnp.mean(jnp.square(adv)))
            adv_std = jnp.sqrt(jnp.maximum(adv_sq - jnp.square(adv_mean), 1e-12))

            # flatten (T, B_local) → (T·B_local,)
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]),
                (traj.obs, traj.action, traj.log_prob, traj.value, adv, ret),
            )
            n = cfg.horizon * local_envs
            mb_size = n // cfg.num_minibatches

            def epoch(carry, ek):
                params, opt_state = carry
                if cfg.shuffle_mode == "time":
                    # contiguous-row gather (see PPOConfig.shuffle_mode):
                    # permute the horizon axis only; a minibatch below is
                    # then (horizon/num_minibatches) timesteps × all envs
                    permT = jax.random.permutation(ek, cfg.horizon)
                    shuffled = jax.tree.map(
                        lambda x: x.reshape(
                            (cfg.horizon, local_envs) + x.shape[1:]
                        )[permT].reshape(x.shape),
                        flat,
                    )
                else:
                    perm = jax.random.permutation(ek, n)
                    shuffled = jax.tree.map(lambda x: x[perm], flat)

                def minibatch(carry, mb_idx):
                    params, opt_state = carry
                    mb = jax.tree.map(
                        lambda x: jax.lax.dynamic_slice_in_dim(
                            x, mb_idx * mb_size, mb_size
                        ),
                        shuffled,
                    )
                    grads, aux = jax.grad(loss_fn, has_aux=True)(
                        params, mb, (adv_mean, adv_std), norm, floor
                    )
                    grads = jax.tree.map(pmean, grads)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), aux

                (params, opt_state), auxs = jax.lax.scan(
                    minibatch, (params, opt_state), jnp.arange(cfg.num_minibatches)
                )
                return (params, opt_state), auxs

            epoch_keys = jax.random.split(shard_key, cfg.num_epochs)
            (params, opt_state), auxs = jax.lax.scan(
                epoch, (params, opt_state), epoch_keys
            )
            pg_loss, v_loss, entropy = jax.tree.map(jnp.mean, auxs)
            metrics = {
                # raw env reward, captured before reward_scale / normalization
                "reward_per_step": raw_reward_mean,
                "episode_done_rate": pmean(jnp.mean(traj.done.astype(jnp.float32))),
                "pg_loss": pmean(pg_loss),
                "v_loss": pmean(v_loss),
                "entropy": entropy,
                "adv_std": adv_std,
                "log_std_floor": floor,
            }
            if cfg.normalize_reward:
                metrics["reward_norm_std"] = jnp.sqrt(ret_norm.var[0] + 1e-8)
            if traj.env_metrics is not None:
                # env metric channels (SURVEY.md §5.5): batch means plus
                # done-masked episode-END means — the honest per-episode
                # statistic (e.g. ALLSTEPS "stones reached per episode"
                # rather than a mid-episode snapshot). VALID-masked: a
                # channel may be NaN outside its slots (MixedSuite's
                # per-family union channels span the whole batch with NaN
                # off-family); means run over the finite slots only. Every
                # shard holds equal family proportions (family sub-batches
                # shard over the same mesh), so pmean-of-shard-means stays
                # the true mean.
                dmask = traj.done.astype(jnp.float32)
                for k, v in traj.env_metrics.items():
                    v = v.astype(jnp.float32)
                    valid = jnp.isfinite(v).astype(jnp.float32)
                    vz = jnp.where(valid > 0.0, v, 0.0)
                    vrate = pmean(jnp.mean(valid))
                    metrics["env/" + k] = jnp.where(
                        vrate > 0.0,
                        pmean(jnp.mean(vz)) / jnp.maximum(vrate, 1e-9),
                        jnp.nan,
                    )
                    # NaN (not 0) when the batch contains no episode ends —
                    # a fabricated 0 would read as "policy scores 0"
                    dv_rate = pmean(jnp.mean(dmask * valid))
                    metrics["ep_end/" + k] = jnp.where(
                        dv_rate > 0.0,
                        pmean(jnp.mean(vz * dmask)) / jnp.maximum(dv_rate, 1e-9),
                        jnp.nan,
                    )
            return (params, opt_state, new_norm, env_state, obs, key, metrics,
                    ret_accum, ret_norm)

        if self.mesh is None:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state: TrainState):
                key, sk = jax.random.split(state.key)
                # Rollout consumes fold_in(key, 0), NOT key itself (mirrors
                # the mesh path): the stored key's future splits never overlap
                # the threefry streams the rollout already used.
                (params, opt_state, norm, env_state, obs, _, metrics,
                 ret_accum, ret_norm) = update_shard(
                    state.params, state.opt_state, state.obs_norm,
                    state.env_state, state.obs, jax.random.fold_in(key, 0),
                    jax.random.fold_in(sk, 0), _floor_of(state.update_count),
                    state.ret_accum, state.ret_norm,
                )
                return (
                    TrainState(
                        params=params,
                        opt_state=opt_state,
                        env_state=env_state,
                        obs=obs,
                        key=key,
                        update_count=state.update_count + 1,
                        obs_norm=norm,
                        ret_accum=ret_accum,
                        ret_norm=ret_norm,
                    ),
                    metrics,
                )

        else:
            mesh = self.mesh

            @functools.partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(ENV_AXIS), P(ENV_AXIS), P(), P(),
                          P(ENV_AXIS), P()),
                out_specs=(P(), P(), P(), P(ENV_AXIS), P(ENV_AXIS), P(), P(),
                           P(ENV_AXIS), P()),
                check_vma=False,
            )
            def sharded_update(params, opt_state, norm, env_state, obs, key,
                               floor, ret_accum, ret_norm):
                idx = jax.lax.axis_index(ENV_AXIS)
                key, sk = jax.random.split(key)
                shard_key = jax.random.fold_in(sk, idx)
                (params, opt_state, norm, env_state, obs, _, metrics,
                 ret_accum, ret_norm) = update_shard(
                    params, opt_state, norm, env_state, obs,
                    jax.random.fold_in(key, idx), shard_key, floor,
                    ret_accum, ret_norm,
                )
                # grads + norm stats were psum-averaged → replicas identical
                return (params, opt_state, norm, env_state, obs, key, metrics,
                        ret_accum, ret_norm)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state: TrainState):
                (params, opt_state, norm, env_state, obs, key, metrics,
                 ret_accum, ret_norm) = sharded_update(
                    state.params, state.opt_state, state.obs_norm,
                    state.env_state, state.obs, state.key,
                    _floor_of(state.update_count),
                    state.ret_accum, state.ret_norm,
                )
                return (
                    TrainState(
                        params=params,
                        opt_state=opt_state,
                        env_state=env_state,
                        obs=obs,
                        key=key,
                        update_count=state.update_count + 1,
                        obs_norm=norm,
                        ret_accum=ret_accum,
                        ret_norm=ret_norm,
                    ),
                    metrics,
                )

        self.train_step = train_step


def dryrun_train_step(env: FnEnv, mesh: Mesh, num_envs: int) -> None:
    """Tiny-shape full training step over the mesh — driver dry-run hook."""
    cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=1, hidden=(32, 32))
    learner = PPOLearner(env, cfg, mesh=mesh, num_envs=num_envs)
    state = learner.init(seed=0)
    state, metrics = learner.train_step(state)
    jax.block_until_ready(state.params)
