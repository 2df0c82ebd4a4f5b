"""Round-2h TPU session: finish 2f (hung mid-cont2) + run 2g's monkey phase.

The 2f process stalled hard at cont2 update ~1560 (0% CPU, futex wait, 40 min
silent — axon tunnel drop) and was killed; ckpt/stepper3_cont2 has update
1500. This session resumes and finishes the queue in ONE claim (axon claim
churn is 5-15 min per process death — batch everything):

  A. Resume stepper continuation-2 (stone-dominated reward) from 1500,
     train 1000 more updates -> ckpt/stepper3_cont2 @ 2500.
  B. Fixed-stage evals (stage 0/2/4, stoch+det) of the final state.
  C. Config-5 single-chip learning row: mixed suite, 200 updates.
  D. Monkey with bar-dominated reward (2g phases A+B verbatim, checkpoints
     every 250 updates for hang robustness) -> ckpt/monkey3g.

Appends JSON lines to scripts/tpu_round2h_results.jsonl.
"""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2h_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.5,
)
SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
LEARNER = PPOLearner(
    mocca_envs_tpu.make("Walker3DStepperEnv-v0", params=SP), CFG, num_envs=NUM_ENVS
)
EVAL_STEPPER = make_walker3d_stepper(
    params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))
)
CONT_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
CONT_LEARNER = PPOLearner(
    make_walker3d_stepper(params=CONT_SP), CFG, num_envs=NUM_ENVS
)


def eval_fixed_stage(state, stage, tag, deterministic=False, steps=900):
    """Pin every env to ``stage``; count only episodes begun after the pin."""
    params, norm = state.params, state.obs_norm
    net = LEARNER.net
    env_state = ws.set_stage(state.env_state, float(stage))
    rc0 = np.asarray(env_state.reset_count).copy()

    @jax.jit
    def step_fn(s, key):
        obs = jax.vmap(EVAL_STEPPER.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        noise = jax.random.normal(key, mean.shape)
        a = mean if deterministic else mean + jnp.exp(log_std) * noise
        pre = s.task.next_step
        tr = jax.vmap(EVAL_STEPPER.step)(s, a)
        return tr.state, tr.done, pre, tr.state.reset_count

    key = jax.random.key(31 + stage)
    done_steps = []
    for _t in range(steps):
        key, ka = jax.random.split(key)
        env_state, done, pre, rc = step_fn(env_state, ka)
        d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_steps.append(np.asarray(pre)[d])
    ds = np.concatenate(done_steps) if done_steps else np.zeros(1)
    emit(
        phase=tag, stage=stage, deterministic=deterministic,
        episodes=int(ds.size),
        ep_end_steps_mean=round(float(ds.mean()), 2),
        ep_end_steps_p50=float(np.percentile(ds, 50)),
        ep_end_steps_p90=float(np.percentile(ds, 90)),
        frac_ge_4=round(float((ds >= 4).mean()), 3),
        frac_ge_8=round(float((ds >= 8).mean()), 3),
        frac_complete=round(float((ds >= SP.stones.num_steps - 1).mean()), 3),
    )


# ---------------- A: resume + finish continuation-2
state = None
try:
    mgr = CheckpointManager("/root/repo/ckpt/stepper3_cont2", max_to_keep=2)
    base = mgr.latest_step()
    assert base is not None, "stepper3_cont2 checkpoint missing"
    state = mgr.restore(LEARNER.init(seed=0), base)
    emit(phase="cont2h", resumed_from=base)
    t0 = time.time()
    for u in range(1000):
        state, metrics = CONT_LEARNER.train_step(state)
        if (u + 1) % 50 == 0 or u == 0:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            task = state.env_state.task
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * CFG.horizon * (50 if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="cont2h", update=base + u + 1, **m)
        if (u + 1) % 250 == 0:
            mgr.save(base + u + 1, state)
            mgr.wait()
    mgr.save(base + 1000, state)
    mgr.wait()
    mgr.close()
except Exception:
    traceback.print_exc()
    emit(phase="cont2h", ok=False, error=traceback.format_exc()[-300:])

# ---------------- B: fixed-stage re-evals
if state is not None:
    for stg in (0, 2, 4):
        for det in (False, True):
            try:
                eval_fixed_stage(state, stg, "evalC", deterministic=det)
            except Exception:
                traceback.print_exc()
                emit(phase="evalC", stage=stg, ok=False)

# ---------------- C: config-5 mixed-suite learning row (single chip)
try:
    from mocca_envs_tpu.harness.mixed import MixedSuite

    suite = MixedSuite(
        ("Walker3DCustomEnv-v0", "CassieEnv-v0", "Monkey3DStepperEnv-v0"),
        (1024, 1024, 1024),
    )
    cfg5 = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=24, lr=3e-4,
        reward_scale=0.1, log_std_min=-1.0,
    )
    learner5 = PPOLearner(suite, cfg5, num_envs=suite.num_envs)
    st5 = learner5.init(seed=0)
    t0 = time.time()
    for u in range(200):
        st5, metrics = learner5.train_step(st5)
        if (u + 1) % 25 == 0 or u == 0:
            jax.block_until_ready(st5.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            m["env_steps_per_s"] = round(
                suite.num_envs * cfg5.horizon * (25 if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="mixed5", update=u + 1, **m)
except Exception:
    traceback.print_exc()
    emit(phase="mixed5", ok=False, error=traceback.format_exc()[-300:])

# ---------------- D: monkey with bar-dominated reward (2g)
from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams

MP = MonkeyParams().replace(
    adv_threshold=jnp.asarray(6.0, jnp.float32),
    bar_bonus=jnp.asarray(18.0, jnp.float32),
    alive_bonus=jnp.asarray(0.3, jnp.float32),
)
MONKEY = mocca_envs_tpu.make("Monkey3DStepperEnv-v0", params=MP)
MCFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, log_std_min=-1.0,
)

try:
    learner = PPOLearner(MONKEY, MCFG, num_envs=NUM_ENVS)
    mstate = learner.init(seed=0)
    mgr = CheckpointManager("/root/repo/ckpt/monkey3g", max_to_keep=2)
    if mgr.latest_step() is not None:
        mstate = mgr.restore(mstate, mgr.latest_step())
        emit(phase="monkey_rebal", resumed_from=mgr.latest_step())
    t0 = time.time()
    for u in range(2500):
        mstate, metrics = learner.train_step(mstate)
        if (u + 1) % 25 == 0 or u == 0:
            jax.block_until_ready(mstate.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            task = mstate.env_state.task
            m["mean_bars"] = round(float(task.next_bar.mean()), 3)
            m["max_bars"] = int(task.next_bar.max())
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * MCFG.horizon * (25 if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="monkey_rebal", update=u + 1, **m)
        if (u + 1) % 250 == 0:
            mgr.save(u + 1, mstate)
            mgr.wait()
    mgr.save(2500, mstate)
    mgr.wait()
    mgr.close()

    params, norm = mstate.params, mstate.obs_norm
    net = learner.net
    env_state = mstate.env_state

    @jax.jit
    def eval_step(s, key):
        obs = jax.vmap(MONKEY.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        tr = jax.vmap(MONKEY.step)(s, a)
        # post-step, pre-reset count (raw_step computes metrics before the
        # auto-reset) — matches the learner's ep_end/ channel semantics
        return tr.state, tr.done, tr.metrics["bars_reached"], s.task.stage

    key = jax.random.key(7)
    done_bars, done_stage = [], []
    for _t in range(600):
        key, ka = jax.random.split(key)
        env_state, done, pre, stage = eval_step(env_state, ka)
        d = np.asarray(done)
        if d.any():
            done_bars.append(np.asarray(pre)[d])
            done_stage.append(np.asarray(stage)[d])
    db = np.concatenate(done_bars) if done_bars else np.zeros(1)
    dg = np.concatenate(done_stage) if done_stage else np.zeros(1)
    emit(
        phase="eval_monkey_rebal", episodes=int(db.size),
        ep_end_bars_mean=round(float(db.mean()), 2),
        ep_end_bars_p90=float(np.percentile(db, 90)),
        frac_ge_4=round(float((db >= 4).mean()), 3),
        stage_mean=round(float(dg.mean()), 2),
        stage_max=float(dg.max()),
    )
except Exception:
    traceback.print_exc()
    emit(phase="monkey_rebal", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2H SESSION DONE in {time.time()-T0:.0f}s", flush=True)
