"""Round-3e TPU session: monkey with RELEASE-TIMING shaping (VERDICT r2 #4).

3c (bar-dominated reward + spacing curriculum + floor anneal) plateaus at
bars ≈ 2 with entropy pinned on the floor by u650 — passive hanging is the
local optimum the alive bonus funds. This session adds the round-3 shaping
knobs (tasks/monkey_stepper.py):

  - hold_grace=60: the alive bonus stops paying 1 s after the last bar
    hit — hanging without progress earns nothing while energy costs tick;
  - w_swing=0.5: horizontal CoM velocity TOWARD the next bar pays while
    holding — the gradient path from hang → pump → release.

P1 main 2500 u (ckpt/r3_monkey2) → P2 floor-anneal ft 800 u → P3 evals.
Target: ep-end mean bars_reached ≥ 4. JSONL → tpu_round3e_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round3e_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 1.5 * 3600))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams

NUM_ENVS = 4096
MP = MonkeyParams().replace(
    adv_threshold=jnp.asarray(4.0, jnp.float32),
    bar_bonus=jnp.asarray(18.0, jnp.float32),
    alive_bonus=jnp.asarray(0.3, jnp.float32),
    hold_grace=jnp.asarray(60, jnp.int32),
    w_swing=jnp.asarray(0.5, jnp.float32),
)
MONKEY = mocca_envs_tpu.make("Monkey3DStepperEnv-v0", params=MP)
CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                reward_scale=0.1, log_std_min=-1.0)
FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, log_std_min=-1.0,
                   log_std_min_final=-2.0, log_std_anneal_updates=600)


def train(learner, ckpt_dir, n_updates, tag, seed_state=None,
          zero_update_count=False):
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=0)
    start = mgr.latest_step() or 0
    if start:
        try:
            state = mgr.restore(state, start)
            emit(phase=tag, resumed_from=start)
        except Exception:
            import shutil
            mgr.close()
            shutil.rmtree(ckpt_dir, ignore_errors=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
            state = learner.init(seed=0)
            start = 0
            emit(phase=tag, resume_failed="structure mismatch — wiped")
            if seed_state is not None:
                state = seed_state
                if zero_update_count:
                    state = state.replace(
                        update_count=jnp.zeros((), jnp.int32))
    elif seed_state is not None:
        state = seed_state
        if zero_update_count:
            state = state.replace(update_count=jnp.zeros((), jnp.int32))
        emit(phase=tag, seeded=True)
    t0 = time.time()
    u = start
    for u in range(start, n_updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/") and not k.startswith("ep_end/")}
            if np.isfinite(float(metrics.get("ep_end/bars_reached", np.nan))):
                m["ep_bars"] = round(float(metrics["ep_end/bars_reached"]), 3)
            task = state.env_state.task
            m["mean_bars"] = round(float(task.next_bar.mean()), 3)
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * 128 * (50 if u > start else 1)
                / max(time.time() - t0, 1e-9))
            t0 = time.time()
            emit(phase=tag, update=u + 1, **m)
        if (u + 1) % 150 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if time_left() < 420 and (u + 1) % 50 == 0:
            emit(phase=tag, truncated_at=u + 1, reason="deadline")
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()
    return state


def eval_monkey(learner, state, tag, steps=700, deterministic=True):
    params, norm = state.params, state.obs_norm
    net = learner.net
    env_state = state.env_state

    @jax.jit
    def step_fn(s, key):
        obs = jax.vmap(MONKEY.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        a = mean if deterministic else (
            mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape))
        pre = s.task.next_bar
        stage = s.task.stage
        tr = jax.vmap(MONKEY.step)(s, a)
        return tr.state, tr.done, pre, stage

    key = jax.random.key(7)
    done_bars, done_stage = [], []
    for _t in range(steps):
        key, ka = jax.random.split(key)
        env_state, done, pre, stage = step_fn(env_state, ka)
        d = np.asarray(done)
        if d.any():
            done_bars.append(np.asarray(pre)[d])
            done_stage.append(np.asarray(stage)[d])
    db = np.concatenate(done_bars) if done_bars else np.zeros(1)
    dg = np.concatenate(done_stage) if done_stage else np.zeros(1)
    emit(phase=tag, deterministic=deterministic, episodes=int(db.size),
         ep_end_bars_mean=round(float(db.mean()), 2),
         ep_end_bars_p50=float(np.percentile(db, 50)),
         ep_end_bars_p90=float(np.percentile(db, 90)),
         frac_ge_4=round(float((db >= 4).mean()), 3),
         stage_mean=round(float(dg.mean()), 3),
         stage_p90=float(np.percentile(dg, 90)))


def guarded(tag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=tag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])
        return None


emit(phase="session_start", deadline_in_s=round(time_left()))
learner = PPOLearner(MONKEY, CFG, num_envs=NUM_ENVS)
state = guarded("monkey2_main", train, learner, "/root/repo/ckpt/r3_monkey2",
                2500, "monkey2_main")
if state is not None:
    guarded("eval_monkey2_main", eval_monkey, learner, state,
            "eval_monkey2_main")
    ft_learner = PPOLearner(MONKEY, FT_CFG, num_envs=NUM_ENVS)
    ft = guarded("monkey2_ft", train, ft_learner,
                 "/root/repo/ckpt/r3_monkey2_ft",
                 800, "monkey2_ft", seed_state=state, zero_update_count=True)
    if ft is not None:
        guarded("eval_monkey2_ft", eval_monkey, ft_learner, ft,
                "eval_monkey2_ft")
        guarded("eval_monkey2_ft_stoch", eval_monkey, ft_learner, ft,
                "eval_monkey2_ft", deterministic=False)

emit(phase="session_done", ok=bool(state is not None),
     wall_s=round(time.time() - T0, 1))
