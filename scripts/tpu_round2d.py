"""Round-2d TPU session: engine-option benches + missing learning rows.

Runs after tpu_allsteps3.py (one TPU process at a time). Collects:
  A. Engine-option matrix: Cassie reuse_factor on/off, walker block_pgs
     iteration sweep {12, 10, 8}, PD-servoed walker (BASELINE config-2
     wording), headline walker at the tuned config.
  B. Learning rows for families VERDICT r1 flagged as unvalidated:
     Walker3DTerrainEnv, Walker2DCustomEnv (planar), CassiePhaseEnv
     (reconfirm after engine changes).

Appends JSON lines to scripts/tpu_round2d_results.jsonl.
Run:  cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_round2d.py
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2d_results.jsonl"
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
from mocca_envs_tpu.tasks.cassie_task import CASSIE_CONFIG, make_cassie
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


# ---------------- A: engine-option matrix
for tag, thunk in (
    ("cassie_base", lambda: make_cassie()),
    ("cassie_reuse", lambda: make_cassie(
        config=dataclasses.replace(CASSIE_CONFIG, reuse_factor=True))),
    ("cassie_reuse_block", lambda: make_cassie(
        config=dataclasses.replace(CASSIE_CONFIG, reuse_factor=True, block_pgs=True, solver_iters=8))),
    ("walker_block_i10", lambda: mocca_envs_tpu.make(
        "Walker3DCustomEnv-v0", config=EngineConfig(block_pgs=True, solver_iters=10))),
    ("walker_block_i8", lambda: mocca_envs_tpu.make(
        "Walker3DCustomEnv-v0", config=EngineConfig(block_pgs=True, solver_iters=8))),
    ("walker_reuse", lambda: mocca_envs_tpu.make(
        "Walker3DCustomEnv-v0", config=EngineConfig(reuse_factor=True))),
    ("walker_reuse_block_i8", lambda: mocca_envs_tpu.make(
        "Walker3DCustomEnv-v0",
        config=EngineConfig(reuse_factor=True, block_pgs=True, solver_iters=8))),
    ("walker_pd", lambda: mocca_envs_tpu.make("Walker3DPDCustomEnv-v0")),
    ("walker_pd_b16384", None),  # handled below
):
    if tag == "walker_pd_b16384":
        try:
            r = bench_env(mocca_envs_tpu.make("Walker3DPDCustomEnv-v0"), num_envs=16384)
            emit(phase="bench", tag=tag, env_steps_per_s=round(r))
        except Exception:
            traceback.print_exc()
            emit(phase="bench", tag=tag, ok=False, error=traceback.format_exc()[-300:])
        continue
    try:
        r = bench_env(thunk())
        emit(phase="bench", tag=tag, env_steps_per_s=round(r),
             vs_north_star=round(r / 1e6, 3))
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=tag, ok=False, error=traceback.format_exc()[-300:])


def train(env, cfg, updates, log_every, tag):
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    t0 = time.time()
    for u in range(updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % log_every == 0 or u == 0:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            qd = state.env_state.qd
            m["speed"] = round(float(jnp.linalg.norm(qd[:, 0:2], axis=1).mean()), 3)
            m["env_steps_per_s"] = round(
                NUM_ENVS * cfg.horizon * (log_every if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase=tag, update=u + 1, **m)
    return state


# ---------------- B: learning rows
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, log_std_min=-1.0,
)
for env_id, tag, updates, extra in (
    ("Walker3DTerrainEnv-v0", "learn_terrain", 400, dict(mirror_coef=4.0)),
    ("Walker2DCustomEnv-v0", "learn_walker2d", 300, dict(mirror_coef=4.0)),
    ("CassiePhaseEnv-v0", "learn_cassiephase", 150, {}),
):
    try:
        env = mocca_envs_tpu.make(env_id)
        cfg = dataclasses.replace(CFG, **extra)
        train(env, cfg, updates=updates, log_every=25, tag=tag)
    except Exception:
        traceback.print_exc()
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])

# ---------------- C: episode-end stepper evaluation (ALLSTEPS metric).
# mean_steps_reached in the training logs is an instantaneous snapshot of
# envs mid-episode; the paper's metric is stones reached per EPISODE. Replay
# the stepper policy and histogram next_step at done events.
import numpy as np

from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.transfer import transfer_train_state  # noqa: F401
from mocca_envs_tpu.tasks.walker_stepper import StepperParams

SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
STEPPER = mocca_envs_tpu.make("Walker3DStepperEnv-v0", params=SP)


def eval_stepper(state, learner, tag):
    params, norm = state.params, state.obs_norm
    net = learner.net
    env_state = state.env_state

    @jax.jit
    def eval_step(s, key):
        obs = jax.vmap(STEPPER.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        pre_next = s.task.next_step
        tr = jax.vmap(STEPPER.step)(s, a)
        return tr.state, tr.done, pre_next, s.task.stage

    key = jax.random.key(123)
    done_steps, done_stage = [], []
    for t in range(600):
        key, ka = jax.random.split(key)
        env_state, done, pre_next, stage = eval_step(env_state, ka)
        d = np.asarray(done)
        if d.any():
            done_steps.append(np.asarray(pre_next)[d])
            done_stage.append(np.asarray(stage)[d])
    ds = np.concatenate(done_steps) if done_steps else np.zeros(1)
    dg = np.concatenate(done_stage) if done_stage else np.zeros(1)
    emit(
        phase=tag, episodes=int(ds.size),
        ep_end_steps_mean=round(float(ds.mean()), 2),
        ep_end_steps_p50=float(np.percentile(ds, 50)),
        ep_end_steps_p90=float(np.percentile(ds, 90)),
        frac_ge_4=round(float((ds >= 4).mean()), 3),
        frac_ge_8=round(float((ds >= 8).mean()), 3),
        stage_mean=round(float(dg.mean()), 2),
        stage_max=float(dg.max()),
    )


def restore_latest(learner, names, tag):
    like = learner.init(seed=0)
    for ck in names:
        try:
            mgr = CheckpointManager(f"/root/repo/ckpt/{ck}")
            step_no = mgr.latest_step()
            if step_no is not None:
                state = mgr.restore(like, step_no)
                emit(phase=tag, restored=ck, at=step_no)
                return state
        except Exception:
            continue
    return None


cfg_s = dataclasses.replace(CFG, mirror_coef=4.0)
learner_s = PPOLearner(STEPPER, cfg_s, num_envs=NUM_ENVS)
try:
    state0 = restore_latest(learner_s, ("stepper3_ft", "stepper3"), "eval_stepper")
    if state0 is not None:
        eval_stepper(state0, learner_s, "eval_stepper")
except Exception:
    traceback.print_exc()
    emit(phase="eval_stepper", ok=False, error=traceback.format_exc()[-300:])

# ---------------- D: stepper curriculum continuation (push stages higher).
# Continue from the v3 checkpoint at a tighter exploration floor: stage>2
# stones need precision, and sigma=0.37 foot placement caps it; -1.5 lets
# PPO anneal noise while keeping a floor.
try:
    cfg_c = dataclasses.replace(CFG, mirror_coef=4.0, log_std_min=-1.5)
    learner_c = PPOLearner(STEPPER, cfg_c, num_envs=NUM_ENVS)
    state = restore_latest(learner_c, ("stepper3_ft", "stepper3"), "stepper_cont")
    if state is not None:
        mgr = CheckpointManager("/root/repo/ckpt/stepper3_cont", max_to_keep=2)
        t0 = time.time()
        for u in range(2500):
            state, metrics = learner_c.train_step(state)
            if (u + 1) % 25 == 0 or u == 0:
                jax.block_until_ready(state.params)
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                task = state.env_state.task
                m["mean_stage"] = round(float(task.stage.mean()), 3)
                m["max_stage"] = float(task.stage.max())
                m["env_steps_per_s"] = round(
                    NUM_ENVS * cfg_c.horizon * (25 if u else 1)
                    / max(time.time() - t0, 1e-9)
                )
                t0 = time.time()
                emit(phase="stepper_cont", update=u + 1, **m)
            if (u + 1) % 500 == 0:
                mgr.save(u + 1, state)
                mgr.wait()
        mgr.save(2500, state)
        mgr.wait()
        mgr.close()
        eval_stepper(state, learner_c, "eval_stepper_cont")
except Exception:
    traceback.print_exc()
    emit(phase="stepper_cont", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2D SESSION DONE in {time.time()-T0:.0f}s", flush=True)
