"""Round-3h TPU session: monkey with NO-PROGRESS TERMINATION.

3c plateaued at exactly 2.0 bars with episode_done_rate ≈ 0.001 — the
policy hangs on bar 2 until the 1000-step cap. 3e's shaping (hold_grace
stops the alive bonus, w_swing pays toward-target CoM speed) changes the
REWARD of hanging but not its VALUE: bootstrapped returns from a safe hang
still dominate a risky release. This session adds the round-3h lever —
``progress_timeout=120`` (2 s at 60 Hz control): an episode with no new
bar for 120 steps ENDS, making the hang state terminal for the value
function too. Combined with 3e's shaping and the spacing curriculum.

Seeds from 3e's main checkpoint when present (same pytree; the timeout is
params data, not structure). P1 main 2200 u → P2 floor-anneal ft 700 u →
evals (ep-end bars, frac ≥ 4 — the VERDICT r2 #4 target).

JSONL → scripts/tpu_round3h_results.jsonl.
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

OUT = "scripts/tpu_round3h_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 1.2 * 3600))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams, make_monkey3d_stepper

NUM_ENVS = 4096

MP = MonkeyParams().replace(
    adv_threshold=jnp.asarray(4.0, jnp.float32),
    alive_bonus=jnp.asarray(0.3, jnp.float32),
    hold_grace=jnp.asarray(60, jnp.int32),
    w_swing=jnp.asarray(0.5, jnp.float32),
    progress_timeout=jnp.asarray(120, jnp.int32),
)
MONKEY = make_monkey3d_stepper(params=MP, name="Monkey3h")

CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                reward_scale=0.1, log_std_min=-1.0)
FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, log_std_min=-1.0,
                   log_std_min_final=-2.0, log_std_anneal_updates=600)


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


def train(learner, ckpt_dir, n_updates, tag, seed_state=None,
          zero_update_count=False):
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=1)
    start = mgr.latest_step()
    if start is not None:
        try:
            state = mgr.restore(state, start)
            emit(phase=tag, resumed_from=start)
        except Exception:
            import shutil
            mgr.close()
            shutil.rmtree(ckpt_dir, ignore_errors=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
            state = learner.init(seed=1)
            start = None
            emit(phase=tag, resume_failed="structure mismatch — wiped")
    if start is None:
        start = 0
        if seed_state is not None:
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
            for k in ("ep_end/bars_reached",):
                if k in metrics and np.isfinite(float(metrics[k])):
                    m["ep_bars"] = round(float(metrics[k]), 3)
            if "env/bars_reached" in metrics:
                m["mean_bars"] = round(float(metrics["env/bars_reached"]), 3)
            m["mean_stage"] = round(float(state.env_state.task.stage.mean()), 3)
            m["max_stage"] = float(state.env_state.task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * 128 * (50 if u > start else 1)
                / max(time.time() - t0, 1e-9))
            emit(phase=tag, update=u + 1, **m)
            t0 = time.time()
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


def seed_from_3e(learner):
    """Warm-start from 3e's main checkpoint (identical pytree structure)."""
    for d in ("/root/repo/ckpt/r3_monkey2",):
        mgr = CheckpointManager(d, max_to_keep=2)
        s0 = mgr.latest_step()
        if s0 is not None:
            try:
                st = mgr.restore(learner.init(seed=1), s0)
                mgr.close()
                emit(phase="monkey3_seed", source=f"{d}@{s0}")
                return st.replace(update_count=jnp.zeros((), jnp.int32))
            except Exception:
                emit(phase="monkey3_seed", failed=d)
        mgr.close()
    emit(phase="monkey3_seed", source="fresh")
    return None


emit(phase="session_start", deadline_in_s=round(time_left()))
learner = PPOLearner(MONKEY, CFG, num_envs=NUM_ENVS)
seeded = seed_from_3e(learner)
state = guarded("monkey3_main", train, learner, "/root/repo/ckpt/r3_monkey3",
                2200, "monkey3_main", seed_state=seeded)
if state is not None:
    guarded("eval_monkey3_main", eval_monkey, learner, state,
            "eval_monkey3_main")
    ft_learner = PPOLearner(MONKEY, FT_CFG, num_envs=NUM_ENVS)
    ft = guarded("monkey3_ft", train, ft_learner,
                 "/root/repo/ckpt/r3_monkey3_ft",
                 700, "monkey3_ft", seed_state=state, zero_update_count=True)
    if ft is not None:
        guarded("eval_monkey3_ft", eval_monkey, ft_learner, ft,
                "eval_monkey3_ft")
        guarded("eval_monkey3_ft_stoch", eval_monkey, ft_learner, ft,
                "eval_monkey3_ft", deterministic=False)

emit(phase="session_done", ok=bool(state is not None),
     wall_s=round(time.time() - T0, 1))
