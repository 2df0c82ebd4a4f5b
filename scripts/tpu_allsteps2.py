"""ALLSTEPS pipeline on TPU, round 2b — after the joint-limit solver-row fix.

The first run (tpu_allsteps.py / tpu_allsteps_results.jsonl) showed pretrain
stuck at reward −100/step: the old limit projection clamp broke momentum
conservation and random-torque walkers flew to z≈50 m (scripts/diag_flight.py),
so "progress" was a ±140/step lottery. Limits are now unilateral PGS rows.

Phases:
  A. Throughput re-measure with the extra nlim solver rows
     (walker flat / stepper stones / terrain hf / cassie PD).
  B. Pretrain Walker3DCustomEnv (mirror PPO).
  C. Transfer → Walker3DStepperEnv, per-env adaptive curriculum.
  D. Monkey3DStepperEnv learning smoke.

Appends JSON lines to scripts/tpu_allsteps2_results.jsonl.
Run:  PYTHONPATH=/root/repo python scripts/tpu_allsteps2.py
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_allsteps2_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import transfer_train_state

NUM_ENVS = 4096


def bench_env(env_id, steps=50, reps=3):
    env = mocca_envs_tpu.make(env_id)
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
    return NUM_ENVS * steps / best


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


# ---------------- A: throughput with limit rows
for env_id, tag in (
    ("Walker3DCustomEnv-v0", "bench_walker"),
    ("Walker3DStepperEnv-v0", "bench_stepper"),
    ("Walker3DTerrainEnv-v0", "bench_terrain"),
    ("CassieEnv-v0", "bench_cassie"),
    ("Monkey3DStepperEnv-v0", "bench_monkey"),
):
    try:
        r = bench_env(env_id)
        emit(phase=tag, env_steps_per_s=round(r), vs_north_star=round(r / 1e6, 3))
    except Exception:
        traceback.print_exc()
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])

# ---------------- A2: PD-hold standing sanity (RL fixed-point exists?)
try:
    from mocca_envs_tpu.models import walker3d as _w3d
    from mocca_envs_tpu.ops.kinematics import joint_q as _jq, joint_qd as _jqd

    _env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    _model = _w3d.make_model()
    _N, _S = 1024, 300
    _st = jax.jit(jax.vmap(_env.init))(rng_mod.env_keys(rng_mod.root_key(0), _N))

    @jax.jit
    def _stand(state, kp, kd):
        def body(s, _):
            qj = jax.vmap(lambda v: _jq(_model, v))(s.q)
            qdj = jax.vmap(lambda v: _jqd(_model, v))(s.qd)
            a = jnp.clip(kp * (-qj) - kd * qdj, -1.0, 1.0)
            tr = jax.vmap(_env.step)(s, a)
            return tr.state, (tr.reward, tr.done)

        s, (r, d) = jax.lax.scan(body, state, None, length=_S)
        return r, d

    for kp, kd in ((2.0, 0.1), (5.0, 0.3)):
        r, d = _stand(_st, kp, kd)
        r, d = np.asarray(r), np.asarray(d)
        first = np.argmax(d, axis=0).astype(float)
        first[~d.any(axis=0)] = _S
        emit(phase="stand", kp=kp, kd=kd, mean_alive=round(first.mean(), 1),
             of=_S, reward_per_step=round(float(r.mean()), 3))
except Exception:
    traceback.print_exc()
    emit(phase="stand", ok=False, error=traceback.format_exc()[-300:])

# ---------------- B: pretrain walker
try:
    walker = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    cfg = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
        reward_scale=0.1, mirror_coef=4.0,
    )
    pre_state = train(walker, cfg, updates=600, log_every=50, tag="pretrain")
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
        stepper, cfg_s, updates=2000, log_every=25, tag="stepper",
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

print(f"ALLSTEPS2 SESSION DONE in {time.time()-T0:.0f}s", flush=True)
