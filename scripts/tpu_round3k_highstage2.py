"""Round-3k TPU session: second pinned high-stage round (stages 5–9).

3g (pinned 4–9 from the pre-anneal ckpt) lifted stage-4 ep-end from 8.01
to 14.61 (p50 = full chain) and stage 5 to 6.95 — the VERDICT bar is ≥ 8
AT stage ≥ 5. Iterate once more: seed from the 3g checkpoint, pin the
mixture one stage harder (5–9), re-open exploration (floor −1.5 → −2 over
500 u), 800 updates, eval stages 4/5/6.

JSONL → scripts/tpu_round3k_results.jsonl.
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

OUT = "scripts/tpu_round3k_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 70 * 60))


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

SP = StepperParams.default()
STONE_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
PIN_SP = STONE_SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))

FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.5,
                   log_std_min_final=-2.0, log_std_anneal_updates=500)

EVAL_STEPPER = make_walker3d_stepper(params=PIN_SP, name="EvalStepper3k")


def guarded(gtag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=gtag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase=gtag, ok=False, error=traceback.format_exc()[-300:])
        return None


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
    res = dict(
        phase=tag, stage=stage, deterministic=deterministic,
        episodes=int(ds.size),
        ep_end_steps_mean=round(float(ds.mean()), 2),
        ep_end_steps_p50=float(np.percentile(ds, 50)),
        ep_end_steps_p90=float(np.percentile(ds, 90)),
        frac_ge_4=round(float((ds >= 4).mean()), 3),
        frac_ge_8=round(float((ds >= 8).mean()), 3),
        frac_complete=round(float((ds >= 19).mean()), 3),
    )
    emit(**res)
    return res


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    env = make_walker3d_stepper(params=PIN_SP, name="StepperHS2")
    learner = PPOLearner(env, FT_CFG, num_envs=NUM_ENVS)

    src_dir = f"{CKPT}/r3_st_hs"
    out_dir = f"{CKPT}/r3_st_hs2"
    mgr = CheckpointManager(out_dir, max_to_keep=2)
    start = mgr.latest_step()
    state = learner.init(seed=1)
    if start is not None:
        try:
            state = mgr.restore(state, start)
            emit(phase="hs2", resumed_from=start)
        except Exception:
            import shutil
            mgr.close()
            shutil.rmtree(out_dir, ignore_errors=True)
            mgr = CheckpointManager(out_dir, max_to_keep=2)
            start = None
            emit(phase="hs2", resume_failed="structure mismatch — wiped")
    if start is None:
        start = 0
        smgr = CheckpointManager(src_dir, max_to_keep=2)
        s0 = smgr.latest_step()
        if s0 is None:
            emit(phase="hs2", skipped="no source checkpoint")
            return
        state = smgr.restore(state, s0)
        smgr.close()
        state = state.replace(update_count=jnp.zeros((), jnp.int32))
        emit(phase="hs2", seeded_from=f"{src_dir}@{s0}")

    stages = 5.0 + (jnp.arange(NUM_ENVS) % 5).astype(jnp.float32)
    state = state.replace(env_state=ws.set_stage(state.env_state, stages))

    t0 = time.time()
    u = start
    for u in range(start, 800):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/") and not k.startswith("ep_end/")}
            if "ep_end/steps_reached" in metrics and np.isfinite(
                    float(metrics["ep_end/steps_reached"])):
                m["ep_steps"] = round(float(metrics["ep_end/steps_reached"]), 3)
            m["mean_stage"] = round(float(state.env_state.task.stage.mean()), 3)
            m["env_steps_per_s"] = round(
                NUM_ENVS * 128 * (50 if u > start else 1)
                / max(time.time() - t0, 1e-9))
            emit(phase="hs2", update=u + 1, **m)
            t0 = time.time()
        if (u + 1) % 150 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if time_left() < 900 and (u + 1) % 50 == 0:
            emit(phase="hs2", truncated_at=u + 1, reason="deadline")
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()

    for stage in (4, 5, 6):
        guarded("eval_hs2", eval_fixed_stage, learner.net, state, stage,
                "eval_hs2")
    guarded("eval_hs2", eval_fixed_stage, learner.net, state, 5, "eval_hs2",
            deterministic=False)
    emit(phase="session_done", wall_s=round(time.time() - T0, 1))


main()
