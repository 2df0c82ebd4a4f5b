"""ALLSTEPS pipeline on TPU — pretrain → transfer → curriculum (one claim).

VERDICT r1 #4's done-gate: "mean steps_reached > 4 at stage ≥ 2 from
scratch-pretrain in a bounded wall-clock run". Phases:

  A. Walker3DTerrainEnv throughput after the gather-free patch extraction.
  B. Pretrain Walker3DCustomEnv (mirror-symmetry PPO, round-1 recipe:
     obs-norm + 0.1 reward scale).
  C. Transfer into Walker3DStepperEnv; per-env adaptive curriculum
     (adv_threshold=14/16 stones) + mirror loss; log stage/progress curves.
  D. Monkey3DStepperEnv learning smoke (reward trend — weak-#8 evidence).

Appends JSON lines to scripts/tpu_allsteps_results.jsonl.
Run:  PYTHONPATH=/root/repo python scripts/tpu_allsteps.py
"""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_allsteps_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import transfer_train_state

NUM_ENVS = 4096


def train(env, cfg, updates, log_every, tag, init_state=None, stop_fn=None):
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    if init_state is not None:
        state = transfer_train_state(init_state, state)
    t0 = time.time()
    for u in range(updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % log_every == 0 or u == 0:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            task = state.env_state.task
            if hasattr(task, "next_step"):
                m["mean_steps_reached"] = round(float(task.next_step.mean()), 3)
                m["max_steps_reached"] = int(task.next_step.max())
            if hasattr(task, "next_bar"):
                m["mean_bars_reached"] = round(float(task.next_bar.mean()), 3)
            if hasattr(task, "stage"):
                m["mean_stage"] = round(float(task.stage.mean()), 3)
                m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * cfg.horizon * (log_every if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase=tag, update=u + 1, **m)
            if stop_fn is not None and stop_fn(m):
                emit(phase=tag, update=u + 1, early_stop=True)
                break
    return state


# ---------------- A: terrain throughput (gather-free patch extraction)
try:
    import functools

    from mocca_envs_tpu.core import rng as rng_mod

    env = mocca_envs_tpu.make("Walker3DTerrainEnv-v0")
    keys = rng_mod.env_keys(rng_mod.root_key(0), NUM_ENVS)
    st = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def timed(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (NUM_ENVS, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(s, a)
            return (tr.state, k), ()

        (s, k), _ = jax.lax.scan(body, (state, key), None, length=50)
        return s, k

    st, k = timed(st, jax.random.key(1))
    jax.block_until_ready(st.q)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, k = timed(st, k)
        jax.block_until_ready(st.q)
        best = min(best, time.perf_counter() - t0)
    emit(phase="terrain_bench", env_steps_per_s=round(NUM_ENVS * 50 / best),
         vs_north_star=round(NUM_ENVS * 50 / best / 1e6, 3))
except Exception:
    traceback.print_exc()
    emit(phase="terrain_bench", ok=False, error=traceback.format_exc()[-300:])

# ---------------- B: pretrain walker
try:
    walker = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    cfg = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
        reward_scale=0.1, mirror_coef=4.0,
    )
    pre_state = train(walker, cfg, updates=400, log_every=50, tag="pretrain")
except Exception:
    traceback.print_exc()
    emit(phase="pretrain", ok=False, error=traceback.format_exc()[-300:])
    raise SystemExit(1)

# ---------------- C: stepper curriculum from the pretrained walker
try:
    stepper = mocca_envs_tpu.make("Walker3DStepperEnv-v0")
    cfg_s = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
        reward_scale=0.1, mirror_coef=4.0,
    )

    def reached_goal(m):
        return m.get("mean_steps_reached", 0) > 4.0 and m.get("mean_stage", 0) >= 2.0

    train(
        stepper, cfg_s, updates=1500, log_every=25, tag="stepper",
        init_state=pre_state, stop_fn=reached_goal,
    )
except Exception:
    traceback.print_exc()
    emit(phase="stepper", ok=False, error=traceback.format_exc()[-300:])

# ---------------- D: monkey learning smoke
try:
    monkey = mocca_envs_tpu.make("Monkey3DStepperEnv-v0")
    cfg_m = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
        reward_scale=0.1,
    )
    train(monkey, cfg_m, updates=300, log_every=25, tag="monkey")
except Exception:
    traceback.print_exc()
    emit(phase="monkey", ok=False, error=traceback.format_exc()[-300:])

print(f"ALLSTEPS SESSION DONE in {time.time()-T0:.0f}s", flush=True)
