"""Round-4g TPU session: config-5 mixed suite at scale + terrain transfer.

P1 — BASELINE config 5's env side on hardware with the round-3 merge
machinery active: MixedSuite (Walker3D + Cassie + Monkey3D, 1024 envs
each) under ONE shared PPO learner with the per-family mirror spec and
the namespaced per-family env/ep_end channels (VERDICT r2 weak #3 fix) —
600 updates, emitting the per-family episode-end channels the round-2f
run could not observe. Single chip here; the same suite trains across
2 processes in tests/test_multihost_spawn.py (CPU mesh).

P2 — Walker3DTerrainEnv transfer: the round-2 terrain row (0.94 m/s
after 400 scratch updates) predates both the ALLSTEPS pretrain-transfer
recipe and the reset-obs fix; this leg embeds the seed-1 pretrain walker
(r4a_s1_pre) into the terrain learner (the walker obs block is an exact
prefix, probes keep fresh init) and trains 800 updates. Grounded
policy-bench row at the end.

JSONL → scripts/tpu_round4g_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4g_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.0 * 3600))

FAILED = []


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def beat():
    with open(HEARTBEAT, "a"):
        os.utime(HEARTBEAT)


def time_left():
    return DEADLINE - time.time()


def guarded(tag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=tag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        FAILED.append(tag)
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])
        return None


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

CKPT = "/root/repo/ckpt"


def train_loop(learner, state, n_updates, tag, ckpt_dir, log_every=25,
               extra_channels=()):
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    start = mgr.latest_step()
    if start is not None:
        state = mgr.restore(state, start)
        emit(phase=tag, resumed_from=start)
    else:
        start = 0
    t0 = time.time()
    u = start - 1  # stays if the phase is already complete (retry re-entry)
    for u in range(start, n_updates):
        beat()
        state, metrics = learner.train_step(state)
        if (u + 1) % log_every == 0 or u == start:
            jax.block_until_ready(state.params)
            row = {
                k: round(float(v), 4)
                for k, v in metrics.items()
                if not k.startswith(("env/", "ep_end/"))
            }
            for k in sorted(metrics):
                if k.startswith("ep_end/") or k in extra_channels:
                    val = float(metrics[k])
                    if np.isfinite(val):
                        row[k] = round(val, 3)
            es = state.env_state
            if hasattr(es, "qd"):  # single-family; mixed carries a tuple
                row["speed"] = round(
                    float(jnp.linalg.norm(es.qd[:, 0:2], axis=1).mean()), 3
                )
            n = log_every if u > start else 1
            row["env_steps_per_s"] = round(
                learner.num_envs * learner.config.horizon * n
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase=tag, update=u + 1, **row)
        if (u + 1) % 150 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if time_left() < 420:
            emit(phase=tag, truncated_at=u + 1, reason="deadline")
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()
    return state


def mixed5():
    from mocca_envs_tpu.harness.mixed import MixedSuite

    suite = MixedSuite(
        ("Walker3DCustomEnv-v0", "CassieEnv-v0", "Monkey3DStepperEnv-v0"),
        (1024, 1024, 1024),
    )
    cfg = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=24, lr=3e-4,
        reward_scale=0.1, log_std_min=-1.0, mirror_coef=4.0,
    )
    learner = PPOLearner(suite, cfg, num_envs=suite.num_envs)
    emit(phase="mixed5_setup", num_envs=suite.num_envs,
         obs_dim=suite.obs_dim, act_dim=suite.act_dim,
         mirror_active=suite.mirror is not None)
    state = learner.init(seed=0)
    train_loop(learner, state, 600, "mixed5", f"{CKPT}/r4g_mixed")


def terrain():
    from mocca_envs_tpu.harness.allsteps import (
        AllstepsConfig,
        restore_latest,
    )
    from mocca_envs_tpu.harness.transfer import transfer_train_state
    from mocca_envs_tpu.tasks.walker_terrain import make_walker3d_terrain

    cfg = AllstepsConfig()
    env = make_walker3d_terrain(name="Terrain4g")
    learner = PPOLearner(env, cfg.ppo(), num_envs=cfg.num_envs)

    walker_env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    pre_learner = PPOLearner(walker_env, cfg.ppo(), num_envs=cfg.num_envs)
    pre = restore_latest(pre_learner, f"{CKPT}/r4a_s1_pre", seed=1)
    fresh = learner.init(seed=3)
    if pre is not None:
        state = transfer_train_state(pre, fresh, reset_log_std=-0.5)
        emit(phase="terrain_seed", source="r4a_s1_pre")
    else:
        state = fresh
        emit(phase="terrain_seed", source="scratch (no pretrain ckpt)")
    state = train_loop(
        learner, state, 800, "terrain", f"{CKPT}/r4g_terrain",
        extra_channels=("env/speed",),
    )

    # grounded trained-policy bench row
    params, norm = state.params, state.obs_norm
    net = learner.net
    B, T = 4096, 600
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    s = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(s, obs):
        def body(carry, _):
            s, obs = carry
            o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8),
                         -10.0, 10.0)
            mean, _ls, _v = net.apply(params, o)
            tr = jax.vmap(env.step)(s, mean)
            return (tr.state, tr.obs), ()

        (s, obs), _ = jax.lax.scan(body, (s, obs), None, length=T)
        return s, obs

    obs = jax.jit(jax.vmap(env.obs_fn))(s)
    beat()
    s, obs = rollout(s, obs)
    jax.block_until_ready(s.q)
    times = []
    for _ in range(3):
        beat()
        t0 = time.perf_counter()
        s, obs = rollout(s, obs)
        jax.block_until_ready(s.q)
        times.append(time.perf_counter() - t0)
    emit(phase="bench_policy", tag="terrain_policy_b4096", batch=B,
         steps=T, env_steps_per_s=round(B * T / min(times)),
         finite=bool(jnp.all(jnp.isfinite(s.q))),
         z_mean=round(float(s.q[:, 2].mean()), 3),
         speed=round(float(jnp.linalg.norm(s.qd[:, 0:2], axis=1).mean()),
                     3))


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    guarded("mixed5", mixed5)
    guarded("terrain", terrain)
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
