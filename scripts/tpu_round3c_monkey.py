"""Round-3c TPU session: monkey brachiation — swing chains (VERDICT r2 #4).

Round-2 state: bar-dominated reward + spacing curriculum reached
bars_reached ≈ 1.95 (one swing). This session applies the stepper's full
winning recipe to the monkey: bar-dominated reward, per-env spacing
curriculum from overlap-easy, exploration floor −1.0 for the whole main
run, THEN a floor anneal fine-tune (the lever that was never applied to
the monkey). Target: ep-end mean bars_reached ≥ 4 at a non-trivial stage.

  P1  main run: bar_bonus 18, alive 0.3, adv_threshold 4 (advance on a
      2-swing chain — round-2's 6 made stage 1 nearly unreachable, so the
      curriculum never engaged), floor −1.0, 3000 u → ckpt/r3_monkey
  P2  floor-anneal ft −1 → −2 over 600 u, 800 u → ckpt/r3_monkey_ft
  P3  ep-end evals (bars mean/p90, stage distribution) after each phase

JSONL → scripts/tpu_round3c_results.jsonl.
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

OUT = "scripts/tpu_round3c_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.0 * 3600))


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
state = guarded("monkey_main", train, learner, "/root/repo/ckpt/r3_monkey",
                3000, "monkey_main")
if state is not None:
    guarded("eval_monkey_main", eval_monkey, learner, state, "eval_monkey_main")
    ft_learner = PPOLearner(MONKEY, FT_CFG, num_envs=NUM_ENVS)
    ft = guarded("monkey_ft", train, ft_learner, "/root/repo/ckpt/r3_monkey_ft",
                 800, "monkey_ft", seed_state=state, zero_update_count=True)
    if ft is not None:
        guarded("eval_monkey_ft", eval_monkey, ft_learner, ft, "eval_monkey_ft")
        guarded("eval_monkey_ft_stoch", eval_monkey, ft_learner, ft,
                "eval_monkey_ft", deterministic=False)

emit(phase="session_done", ok=bool(state is not None),
     wall_s=round(time.time() - T0, 1))
