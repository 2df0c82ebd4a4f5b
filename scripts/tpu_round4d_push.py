"""Round-4d TPU session: progressive frontier PUSH toward ALLSTEPS
end-stage mastery (stages 6-9).

4c closed the VERDICT r2 #1 bar (stage-5 det ep-end 8.55 ≥ 8) by pinning
every env to the 5/5/6 frontier. The same consistency-over-mixture logic
applied upward, now that the reset-obs fix makes a 3000-update dwell cost
~14 min: dwell the 4c policy at 6/6/7, then 7/7/8, then 8/8/9 — the last
rung IS the paper's end-stage difficulty (pitch ±50°, yaw ±20°, tilt
±25°, r 0.65-1.35 m at stage 9). Each rung is checkpoint-resumable and
evals its neighborhood; the final policy re-evals stage 5 as a
catastrophic-forgetting check and benches grounded.

JSONL → scripts/tpu_round4d_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4d_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 3.0 * 3600))

FAILED = []


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def beat():
    with open(HEARTBEAT, "a"):
        os.utime(HEARTBEAT)


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.allsteps import (
    AllstepsConfig,
    RunHooks,
    eval_fixed_stage,
    restore_latest,
    train_phase,
)
from mocca_envs_tpu.harness.ppo import PPOLearner
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"

CFG = AllstepsConfig(
    num_envs=NUM_ENVS,
    seed=1,
    ckpt_root=f"{CKPT}/r4d",
    floor_explore=-2.0,
    floor_final=-2.0,
    floor_anneal_updates=0,
    eval_steps=700,
)

HOOKS = RunHooks(emit=emit, beat=beat, time_left=time_left)


def guarded(tag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=tag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        FAILED.append(tag)
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])
        return None


def bench_policy(env, net, params, norm, tag, B=4096, T=600, rounds=3):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(state, obs):
        def body(carry, _):
            s, obs = carry
            o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8),
                         -10.0, 10.0)
            mean, _ls, _v = net.apply(params, o)
            tr = jax.vmap(env.step)(s, mean)
            return (tr.state, tr.obs), ()

        (state, obs), _ = jax.lax.scan(body, (state, obs), None, length=T)
        return state, obs

    obs = jax.jit(jax.vmap(env.obs_fn))(state)
    beat()
    state, obs = rollout(state, obs)
    jax.block_until_ready(state.q)
    times = []
    for _ in range(rounds):
        beat()
        t0 = time.perf_counter()
        state, obs = rollout(state, obs)
        jax.block_until_ready(state.q)
        times.append(time.perf_counter() - t0)
    emit(phase="bench_policy", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(B * T / min(times)),
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         z_mean=round(float(state.q[:, 2].mean()), 3),
         speed=round(float(jnp.linalg.norm(
             state.qd[:, 0:2], axis=1).mean()), 3))


RUNGS = (
    # (tag, ckpt_leaf, base stage for the 2:1 pin, eval stages after)
    ("rung6", "r4d_f6", 6.0, (5, 6, 7)),
    ("rung7", "r4d_f7", 7.0, (6, 7, 8)),
    ("rung8", "r4d_f8", 8.0, (8, 9)),
)
DWELL = 3000


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))

    env = make_walker3d_stepper(
        params=CFG.stepper_params(pinned=True),
        name="Stepper4dPush",
    )
    learner = PPOLearner(env, CFG.ppo(), num_envs=NUM_ENVS)

    state = restore_latest(learner, f"{CKPT}/r4c_fr", seed=1)
    if state is None:
        emit(phase="session_done", ok=False, reason="no r4c_fr ckpt")
        return
    emit(phase="push_seed", source="r4c_fr")

    for tag, leaf, base, eval_stages in RUNGS:
        pin = base + (jnp.arange(NUM_ENVS) % 3 == 2).astype(jnp.float32)
        out = guarded(
            tag, train_phase, learner, f"{CKPT}/{leaf}", DWELL,
            tag, CFG, HOOKS, seed_state=state,
            zero_update_count=True, pin_stages=pin,
        )
        if out is None:
            # crash fallback: train_step donated `state` — disk holds the
            # only live copy (ADVICE r3 #2 pattern)
            state = restore_latest(learner, f"{CKPT}/{leaf}", seed=1)
            if state is None:
                emit(phase="session_done", ok=False, failed=FAILED,
                     wall_s=round(time.time() - T0, 1))
                return
        else:
            state = out[0]
        for stage in eval_stages:
            if time_left() < 300:
                emit(phase="eval", skipped="deadline", stage=stage,
                     after=tag)
                continue
            row = eval_fixed_stage(env, learner.net, state, stage, CFG,
                                   HOOKS)
            emit(phase="eval", after=tag, **row)

    # final-policy extras: stage-9 stochastic, stage-5 forgetting check
    if time_left() > 300:
        row = eval_fixed_stage(env, learner.net, state, 9, CFG, HOOKS,
                               deterministic=False)
        emit(phase="eval", after="rung8", **row)
    if time_left() > 300:
        row = eval_fixed_stage(env, learner.net, state, 5, CFG, HOOKS)
        emit(phase="eval", after="rung8", forgetting_check=True, **row)

    guarded("bench", bench_policy, env, learner.net, state.params,
            state.obs_norm, "stepper_endstage_policy_b4096")

    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
