"""Round-2j TPU session: ALLSTEPS v4 — one long stepper run, floor-scheduled.

Replaces the hand-run two-phase recipe (transfer at floor −1.0, separate
fine-tune at −2.0) with the PPOConfig log-std floor SCHEDULE (−1.0 → −2.2
over 3500 updates), plus the stone-dominated reward the 2f/2h continuation
validated (step_bonus 18, tall 1.0 — the tall-bonus stream must not outpay
risky stone hits as noise anneals). Start: pretrain3 walking policy.

Target (VERDICT round-1 #4 done-bar): fixed-stage episode-end stones ≥ 4
at stage 2. Phases:
  A. Stepper from pretrain3: 4500 updates, adv_threshold 8, mirror 4.0,
     floor schedule; ckpt/stepper4 every 250.
  B. Fixed-stage evals (0/2/4 × stoch/det) of the final state.

Appends JSON lines to scripts/tpu_round2j_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2j_results.jsonl"
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
from mocca_envs_tpu.harness.transfer import transfer_train_state
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
UPDATES = 4500
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, mirror_coef=4.0,
    log_std_min=-1.0, log_std_min_final=-2.2, log_std_anneal_updates=3500,
)
SP = StepperParams.default().replace(
    adv_threshold=jnp.asarray(8.0, jnp.float32),
    step_bonus=jnp.asarray(18.0, jnp.float32),
)
SP = SP.replace(walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)))
STEPPER = make_walker3d_stepper(params=SP)
EVAL_STEPPER = make_walker3d_stepper(
    params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))
)
LEARNER = PPOLearner(STEPPER, CFG, num_envs=NUM_ENVS)


def eval_fixed_stage(state, stage, tag, deterministic=False, steps=900):
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


state = None
try:
    state = LEARNER.init(seed=0)
    mgr = CheckpointManager("/root/repo/ckpt/stepper4", max_to_keep=2)
    start_u = 0
    latest = mgr.latest_step()
    if latest is not None:
        state = mgr.restore(state, latest)
        start_u = latest
        emit(phase="stepper4", resumed_from=latest)
    else:
        pre_mgr = CheckpointManager("/root/repo/ckpt/pretrain3")
        pstep = pre_mgr.latest_step()
        assert pstep is not None, "pretrain3 checkpoint missing"
        pre_learner = PPOLearner(
            mocca_envs_tpu.make("Walker3DCustomEnv-v0"), CFG, num_envs=NUM_ENVS
        )
        pre_state = pre_mgr.restore(pre_learner.init(seed=0), pstep)
        state = transfer_train_state(pre_state, state, reset_log_std=-0.5)
        emit(phase="stepper4", transferred_from="pretrain3", at=pstep)

    t0 = time.time()
    for u in range(start_u, UPDATES):
        state, metrics = LEARNER.train_step(state)
        if (u + 1) % 50 == 0 or u == start_u:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            task = state.env_state.task
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * CFG.horizon * (50 if u > start_u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="stepper4", update=u + 1, **m)
        if (u + 1) % 250 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
    mgr.save(UPDATES, state)
    mgr.wait()
    mgr.close()
except Exception:
    traceback.print_exc()
    emit(phase="stepper4", ok=False, error=traceback.format_exc()[-300:])

if state is not None:
    for stg in (0, 2, 4):
        for det in (False, True):
            try:
                eval_fixed_stage(state, stg, "evalJ", deterministic=det)
            except Exception:
                traceback.print_exc()
                emit(phase="evalJ", stage=stg, ok=False)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2J SESSION DONE in {time.time()-T0:.0f}s", flush=True)
