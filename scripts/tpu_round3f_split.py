"""Round-3f TPU session: split-impulse position correction on hardware.

The split_impulse EngineConfig flag landed with CPU gates green (kernel ≡
oracle both PGS forms, no-energy-injection, resting contact, limit rows —
tests/test_split_impulse.py). What only hardware can answer:

  A. cost — walker/stepper/Cassie/Child3D throughput with the second
     (unilateral-rows-only) PGS pass, vs the same-session split-off row;
  B. the fix — z-drift of long random-torque rollouts (the round-2 "known
     wart": walker z̄→8.8, Child3D →105 at ~3000 steps). diag_pump showed
     drift ∝ max_push_vel, i.e. Baumgarte pumping; split impulse should
     remove the pump at UNCHANGED max_push_vel;
  C. behavior compatibility — the round-3 trained stepper checkpoint
     (ckpt/r3_st_v1_s1_ft) evaluated under split-on physics: fixed-stage
     ep-end stats vs the recorded split-off rows (stage 2 det mean 15.03).

Decision rule (recorded in BENCH.md): flip the default ON iff drift is
killed (walker z̄_final < 2 m), cost < 10% on the walker headline, and the
stepper eval holds within ~10%.

JSONL → scripts/tpu_round3f_results.jsonl.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round3f_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 55 * 60))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper
from mocca_envs_tpu.utils.config import EngineConfig


def guarded(gtag, fn, *a, **kw):
    # first param must not be named "tag" — several wrapped fns take a
    # tag= kwarg of their own (the queue-4 first-run crash)
    if time.time() > DEADLINE:
        emit(phase=gtag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase=gtag, ok=False, error=traceback.format_exc()[-300:])
        return None


def bench_env(env, B=4096, T=600, rounds=3, tag=""):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    key = jax.random.key(1)
    tC = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - tC
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        times.append(time.perf_counter() - t0)
    rate = B * T / min(times)
    emit(phase="bench", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(rate),
         all_round_s=[round(x, 4) for x in times],
         compile_s=round(compile_s, 1),
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         z_mean=round(float(state.q[:, 2].mean()), 3))
    return rate


SPLIT = EngineConfig(split_impulse=True)

# ---------------- A: cost rows (same-session off/on pairs)
guarded("bench", bench_env, mocca_envs_tpu.make("Walker3DCustomEnv-v0"),
        tag="walker_b4096_off")
guarded("bench", bench_env,
        mocca_envs_tpu.make("Walker3DCustomEnv-v0", config=SPLIT),
        tag="walker_b4096_split")
guarded("bench", bench_env,
        mocca_envs_tpu.make("Walker3DStepperEnv-v0", config=SPLIT),
        tag="stepper_b4096_split")
from mocca_envs_tpu.tasks.cassie_task import CASSIE_CONFIG

guarded("bench", bench_env,
        mocca_envs_tpu.make("CassieEnv-v0", config=dataclasses.replace(
            CASSIE_CONFIG, split_impulse=True)),
        tag="cassie_b4096_split")
guarded("bench", bench_env,
        mocca_envs_tpu.make("Child3DCustomEnv-v0", config=SPLIT),
        tag="child3d_b4096_split")


# ---------------- B: z-drift, long random-torque rollouts
def drift(env_id, split, B=1024, T=3000):
    cfg = SPLIT if split else EngineConfig()
    env = mocca_envs_tpu.make(env_id, config=cfg)
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @jax.jit
    def roll(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), tr.state.q[:, 2]

        (state, key), zs = jax.lax.scan(body, (state, key), None, length=T)
        return state, zs

    state, zs = roll(state, jax.random.key(1))
    emit(phase="drift", env=env_id, split=split,
         z_mean_t500=round(float(zs[499].mean()), 3),
         z_mean_t1500=round(float(zs[1499].mean()), 3),
         z_mean_final=round(float(zs[-1].mean()), 3),
         z_max_final=round(float(zs[-1].max()), 3),
         finite=bool(jnp.all(jnp.isfinite(state.q))))


for env_id in ("Walker3DCustomEnv-v0", "Child3DCustomEnv-v0"):
    for split in (False, True):
        guarded("drift", drift, env_id, split)


# ---------------- C: trained stepper under split-on physics
NUM_ENVS = 4096
SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
STONE_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
V1_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0)


def eval_split(ckpt_dir, stage, tag, steps=700):
    # restore with a learner of identical TrainState structure (the engine
    # config is a static closure — it does not change pytree shapes)
    env = make_walker3d_stepper(params=STONE_SP, name="StepperSplitRestore")
    learner = PPOLearner(env, V1_CFG, num_envs=NUM_ENVS)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    step0 = mgr.latest_step()
    if step0 is None:
        emit(phase=tag, skipped="no checkpoint")
        return
    state = mgr.restore(learner.init(seed=1), step0)
    mgr.close()

    eval_env = make_walker3d_stepper(
        config=SPLIT,
        params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32)),
        name="EvalStepperSplit",
    )
    params, norm = state.params, state.obs_norm
    env_state = ws.set_stage(state.env_state, float(stage))
    rc0 = np.asarray(env_state.reset_count).copy()

    @jax.jit
    def step_fn(s, key):
        obs = jax.vmap(eval_env.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, _ls, _v = learner.net.apply(params, o)
        pre = s.task.next_step
        tr = jax.vmap(eval_env.step)(s, mean)
        return tr.state, tr.done, pre, tr.state.reset_count

    key = jax.random.key(97 + stage)
    done_steps = []
    for _t in range(steps):
        key, ka = jax.random.split(key)
        env_state, done, pre, rc = step_fn(env_state, ka)
        d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_steps.append(np.asarray(pre)[d])
    ds = np.concatenate(done_steps) if done_steps else np.zeros(1)
    emit(phase=tag, stage=stage, episodes=int(ds.size),
         ep_end_steps_mean=round(float(ds.mean()), 2),
         ep_end_steps_p50=float(np.percentile(ds, 50)),
         ep_end_steps_p90=float(np.percentile(ds, 90)),
         frac_ge_4=round(float((ds >= 4).mean()), 3),
         frac_ge_8=round(float((ds >= 8).mean()), 3),
         frac_complete=round(float((ds >= 19).mean()), 3))


for stage in (2, 4):
    guarded("eval_split_ft", eval_split, "/root/repo/ckpt/r3_st_v1_s1_ft",
            stage, "eval_split_ft")


# ---------------- D: minibatch shuffle A/B (the 2.3 s/update mystery).
# shuffle_mode="full" re-reads the whole rollout buffer through a
# per-sample gather 4×/update; "time" permutes 128 contiguous horizon
# rows. Same learner otherwise. 3 timed updates after 2 warmups each.
def shuffle_ab(mode, mirror=4.0):
    env = make_walker3d_stepper(params=STONE_SP, name=f"StepperShuf_{mode}")
    cfg = dataclasses.replace(V1_CFG, shuffle_mode=mode, mirror_coef=mirror)
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)
    state = learner.init(seed=3)
    for _ in range(2):
        state, _ = learner.train_step(state)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = learner.train_step(state)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / 3
    emit(phase="shuffle_ab", mode=mode, mirror=mirror,
         s_per_update=round(dt, 4),
         env_steps_per_s=round(NUM_ENVS * 128 / dt),
         pg_loss=round(float(metrics["pg_loss"]), 5))


# three rows decompose the 2.3 s/update (with the NEW matrix-mirror code;
# 3d's toggles measured the OLD gather-mirror from the queue-3 process):
# full+mirror (the shipped recipe), full−mirror (mirror cost, matrix
# form), time+mirror (shuffle-gather cost)
guarded("shuffle_ab", shuffle_ab, "full")
guarded("shuffle_ab", shuffle_ab, "full", mirror=0.0)
guarded("shuffle_ab", shuffle_ab, "time")

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
