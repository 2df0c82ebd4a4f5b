"""ALLSTEPS pipeline on TPU, round 2c — exploration-floor + easy-curriculum run.

Run 2b (tpu_allsteps2.py) diagnosis: pretrain converged to *standing*
(+1.6/step ≈ tall_bonus − costs, entropy 19→5 and still annealing), and the
stepper transfer re-collapsed log_std to −10 — a deterministic stander can
never discover stone bonuses. Fixes exercised here:
  - PPOConfig.log_std_min=−1.0 during pretrain AND stepper (σ ≥ 0.37): with
    that much action noise standing still is unstable, so the optimum is a
    dynamically-stable gait, not a fragile freeze;
  - stones.py stage-interpolated spacing: stage 0 stones overlap (0.35–0.45 m
    on 0.5 m stones — a walkway), end stages reach ALLSTEPS stride ranges;
  - per-env adaptive curriculum with adv_threshold=8;
  - planar-speed logging so "walking" is measured, not inferred from reward;
  - orbax checkpoints so later phases resume without re-pretraining.

Phases:
  A. Benches: block-PGS on/off × solver_iters, batch sweep (anomaly data),
     all five families.
  B. Pretrain Walker3DCustomEnv (mirror PPO, floor −1.0) → ckpt/pretrain.
  C. Stepper: transfer → per-env curriculum → ckpt/stepper.
  C2. Fine-tune stepper at floor −2.0 (sharpen the gait).
  D. Monkey learning row.

Appends JSON lines to scripts/tpu_allsteps3_results.jsonl.
Run:  cd /root/repo && python scripts/tpu_allsteps3.py
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_allsteps3_results.jsonl"
CKPT_ROOT = "/root/repo/ckpt"
T0 = time.time()


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
from mocca_envs_tpu.harness.transfer import transfer_train_state
from mocca_envs_tpu.tasks.walker_stepper import StepperParams
from mocca_envs_tpu.utils.config import EngineConfig

NUM_ENVS = 4096


def bench_env(env, steps=50, reps=3, num_envs=NUM_ENVS):
    keys = rng_mod.env_keys(rng_mod.root_key(0), num_envs)
    st = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def timed(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(s, a)
            return (tr.state, k), ()

        (s, k), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return s, k

    st, k = timed(st, jax.random.key(1))
    jax.block_until_ready(st.q)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st, k = timed(st, k)
        jax.block_until_ready(st.q)
        best = min(best, time.perf_counter() - t0)
    return num_envs * steps / best


def phase_a():
    # block-PGS / solver_iters matrix on the walker (throughput-recovery
    # candidates after the +nlim limit-row cost), plus the batch sweep the
    # round-1 verdict asked to explain.
    for tag, kwargs in (
        ("walker_base", {}),
        ("walker_block", dict(config=EngineConfig(block_pgs=True))),
        ("walker_block_i8", dict(config=EngineConfig(block_pgs=True, solver_iters=8))),
        ("walker_i8", dict(config=EngineConfig(solver_iters=8))),
    ):
        try:
            r = bench_env(mocca_envs_tpu.make("Walker3DCustomEnv-v0", **kwargs))
            emit(phase="benchA", tag=tag, env_steps_per_s=round(r))
        except Exception:
            traceback.print_exc()
            emit(phase="benchA", tag=tag, ok=False, error=traceback.format_exc()[-300:])
    for b in (2048, 4096, 8192, 16384):
        try:
            r = bench_env(mocca_envs_tpu.make("Walker3DCustomEnv-v0"), num_envs=b)
            emit(phase="benchA", tag=f"walker_b{b}", env_steps_per_s=round(r),
                 per_env_us=round(1e6 * b / r / b, 3))
        except Exception:
            traceback.print_exc()
            emit(phase="benchA", tag=f"walker_b{b}", ok=False)
    for env_id, tag in (
        ("Walker3DStepperEnv-v0", "stepper"),
        ("Walker3DTerrainEnv-v0", "terrain"),
        ("CassieEnv-v0", "cassie"),
        ("Monkey3DStepperEnv-v0", "monkey"),
    ):
        try:
            r = bench_env(mocca_envs_tpu.make(env_id))
            emit(phase="benchA", tag=tag, env_steps_per_s=round(r),
                 vs_north_star=round(r / 1e6, 3))
        except Exception:
            traceback.print_exc()
            emit(phase="benchA", tag=tag, ok=False, error=traceback.format_exc()[-300:])


def train(env, cfg, updates, log_every, tag, init_state=None, reset_log_std=None,
          stop_fn=None, ckpt=None, ckpt_every=None):
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    start_u = 0
    mgr = None
    if ckpt is not None:
        mgr = CheckpointManager(os.path.join(CKPT_ROOT, ckpt), max_to_keep=2)
        latest = mgr.latest_step()
        if latest is not None:
            state = mgr.restore(state, latest)
            start_u = latest
            emit(phase=tag, resumed_from=latest)
    if start_u == 0 and init_state is not None:
        state = transfer_train_state(init_state, state, reset_log_std=reset_log_std)
    t0 = time.time()
    for u in range(start_u, updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % log_every == 0 or u == start_u:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            qd = state.env_state.qd
            m["speed"] = round(float(jnp.linalg.norm(qd[:, 0:2], axis=1).mean()), 3)
            task = state.env_state.task
            if hasattr(task, "next_step"):
                m["mean_steps_reached"] = round(float(task.next_step.mean()), 3)
                m["max_steps_reached"] = int(task.next_step.max())
            if hasattr(task, "next_bar"):
                m["mean_bars_reached"] = round(float(task.next_bar.mean()), 3)
                m["max_bars_reached"] = int(task.next_bar.max())
            if hasattr(task, "stage"):
                m["mean_stage"] = round(float(task.stage.mean()), 3)
                m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * cfg.horizon * (log_every if u > start_u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase=tag, update=u + 1, **m)
            if mgr is not None and ckpt_every and (u + 1) % ckpt_every == 0:
                mgr.save(u + 1, state)
                mgr.wait()
            if stop_fn is not None and stop_fn(m):
                emit(phase=tag, update=u + 1, early_stop=True)
                break
    if mgr is not None:
        mgr.save(updates, state)
        mgr.wait()
        mgr.close()
    return state


phase_a()

# ---------------- B: pretrain walker (floor -1.0 keeps exploration alive)
cfg_pre = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
)
try:
    walker = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    pre_state = train(
        walker, cfg_pre, updates=3000, log_every=50, tag="pretrain",
        stop_fn=lambda m: m["speed"] > 1.2 and m["episode_done_rate"] < 0.01,
        ckpt="pretrain3", ckpt_every=1000,
    )
except Exception:
    traceback.print_exc()
    emit(phase="pretrain", ok=False, error=traceback.format_exc()[-300:])
    raise SystemExit(1)

# ---------------- C: stepper per-env curriculum from the pretrained walker
stepper_params = StepperParams.default()
stepper_params = stepper_params.replace(
    adv_threshold=jnp.asarray(8.0, jnp.float32)
)
stepper = mocca_envs_tpu.make("Walker3DStepperEnv-v0", params=stepper_params)
cfg_s = dataclasses.replace(cfg_pre)
try:
    step_state = train(
        stepper, cfg_s, updates=2500, log_every=25, tag="stepper",
        init_state=pre_state,
        stop_fn=lambda m: m.get("mean_steps_reached", 0) > 8.0
        and m.get("mean_stage", 0) >= 5.0,
        ckpt="stepper3", ckpt_every=500,
    )
except Exception:
    traceback.print_exc()
    emit(phase="stepper", ok=False, error=traceback.format_exc()[-300:])
    step_state = None

# ---------------- C2: sharpen at a lower exploration floor
if step_state is not None:
    try:
        cfg_s2 = dataclasses.replace(cfg_s, log_std_min=-2.0)
        learner2 = PPOLearner(stepper, cfg_s2, num_envs=NUM_ENVS)
        state = step_state
        t0 = time.time()
        for u in range(300):
            state, metrics = learner2.train_step(state)
            if (u + 1) % 25 == 0 or u == 0:
                jax.block_until_ready(state.params)
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                task = state.env_state.task
                m["mean_steps_reached"] = round(float(task.next_step.mean()), 3)
                m["mean_stage"] = round(float(task.stage.mean()), 3)
                m["max_stage"] = float(task.stage.max())
                emit(phase="stepper_ft", update=u + 1, **m)
        mgr = CheckpointManager(os.path.join(CKPT_ROOT, "stepper3_ft"), max_to_keep=1)
        mgr.save(300, state)
        mgr.wait()
        mgr.close()
    except Exception:
        traceback.print_exc()
        emit(phase="stepper_ft", ok=False, error=traceback.format_exc()[-300:])

# ---------------- D: monkey learning row
try:
    monkey = mocca_envs_tpu.make("Monkey3DStepperEnv-v0")
    cfg_m = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
        reward_scale=0.1, log_std_min=-1.0,
    )
    train(monkey, cfg_m, updates=600, log_every=25, tag="monkey",
          ckpt="monkey3", ckpt_every=300)
except Exception:
    traceback.print_exc()
    emit(phase="monkey", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ALLSTEPS3 SESSION DONE in {time.time()-T0:.0f}s", flush=True)
