"""Round-3i TPU session: complete the SECOND SEED of the stepper headline.

3b's deadline economics truncated seed 2 (r3_st_v1_s2) around u~700 to
protect the monkey and cull sessions. The ≥2-seeds requirement (VERDICT r2
weak #8) wants seed 2 at the SAME recipe as seed 1's headline: 2600 main
updates + 600 floor-anneal ft, then the fixed-stage evals. This session
resumes the checkpoint where 3b left it and finishes the recipe.

JSONL → scripts/tpu_round3i_results.jsonl.
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

OUT = "scripts/tpu_round3i_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.6 * 3600))


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
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"

SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
STONE_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
V1_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0)
FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
                   log_std_min_final=-2.0, log_std_anneal_updates=500)

EVAL_STEPPER = make_walker3d_stepper(
    params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32)),
    name="EvalStepper3i",
)


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


def train(learner, ckpt_dir, n_updates, tag, seed=2, seed_state=None,
          zero_update_count=False):
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=seed)
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
            state = learner.init(seed=seed)
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
            if "ep_end/steps_reached" in metrics and np.isfinite(
                    float(metrics["ep_end/steps_reached"])):
                m["ep_steps"] = round(float(metrics["ep_end/steps_reached"]), 3)
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
        if time_left() < 900 and (u + 1) % 50 == 0:
            emit(phase=tag, truncated_at=u + 1, reason="deadline")
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()
    return state


def eval_fixed_stage(net, state, stage, tag, deterministic=True, steps=700):
    params, norm = state.params, state.obs_norm
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

    key = jax.random.key(97 + stage)
    done_steps = []
    for _t in range(steps):
        key, ka = jax.random.split(key)
        env_state, done, pre, rc = step_fn(env_state, ka)
        d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_steps.append(np.asarray(pre)[d])
    ds = np.concatenate(done_steps) if done_steps else np.zeros(1)
    emit(phase=tag, stage=stage, deterministic=deterministic,
         episodes=int(ds.size),
         ep_end_steps_mean=round(float(ds.mean()), 2),
         ep_end_steps_p50=float(np.percentile(ds, 50)),
         ep_end_steps_p90=float(np.percentile(ds, 90)),
         frac_ge_4=round(float((ds >= 4).mean()), 3),
         frac_ge_8=round(float((ds >= 8).mean()), 3),
         frac_complete=round(float((ds >= 19).mean()), 3))


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    env = make_walker3d_stepper(params=STONE_SP, name="Stepper_v1_s2c")
    learner = PPOLearner(env, V1_CFG, num_envs=NUM_ENVS)
    state = guarded("r3_st_v1_s2", train, learner, f"{CKPT}/r3_st_v1_s2",
                    2600, "r3_st_v1_s2", seed=2)
    if state is None:
        return
    guarded("eval_r3_st_v1_s2_main", eval_fixed_stage, learner.net, state, 2,
            "eval_r3_st_v1_s2_main")

    ft_learner = PPOLearner(
        make_walker3d_stepper(params=STONE_SP, name="StepperF_v1_s2c"),
        FT_CFG, num_envs=NUM_ENVS)
    ft = guarded("r3_st_v1_s2_ft", train, ft_learner, f"{CKPT}/r3_st_v1_s2_ft",
                 600, "r3_st_v1_s2_ft", seed=2, seed_state=state,
                 zero_update_count=True)
    best = ft if ft is not None else state
    for stage in (0, 2, 4, 6):
        guarded("eval_r3_st_v1_s2_ft", eval_fixed_stage, learner.net, best,
                stage, "eval_r3_st_v1_s2_ft")
    emit(phase="session_done", wall_s=round(time.time() - T0, 1))


main()
