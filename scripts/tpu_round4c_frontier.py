"""Round-4c TPU session: stage-5/6 FRONTIER dwell.

Seed-1's ladder (tpu_round4a_s1_results.jsonl): tilt vision + 4..9
pinned dwell lifted every stage (4: 14.61→15.27, 5: 6.95→7.31,
6: 4.83→5.00 vs round 3g) but stage 5 is still short of the ≥8 bar,
with p90=15 — the top decile nearly completes the chain, so it is a
consistency gap, not a capability cliff. In the 4..9 pin mixture only
1/6 of envs trained at stage 5; this session continues from the hs
checkpoint with EVERY env pinned to the 5/5/6 frontier (2:1), floor
already at −2.0, stone-dominated reward unchanged.

P1 frontier dwell 3000 u (ckpt/r4c_fr, resumable; 10x cheaper after the reset-obs fix) → P2 ladder evals
(4/5/6 det + 5 stoch, row-comparable to 4a) → P3 grounded bench row.
JSONL → scripts/tpu_round4c_results.jsonl.
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

OUT = "scripts/tpu_round4c_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.0 * 3600))

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
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"

CFG = AllstepsConfig(
    num_envs=NUM_ENVS,
    seed=1,
    ckpt_root=f"{CKPT}/r4c",
    floor_explore=-2.0,          # hs already annealed here; hold
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

    # obs carried (tr.obs), like the training rollout — per-step obs_fn
    # re-runs the XLA narrowphase (25x slower on stone scenes, 3j rows)
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


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))

    env = make_walker3d_stepper(
        params=CFG.stepper_params(pinned=True), orient_obs=True,
        name="Stepper4cFrontier", reset_obs="zero",
    )
    learner = PPOLearner(env, CFG.ppo(), num_envs=NUM_ENVS)

    # seed from seed-1's hs checkpoint (4a pipeline, identical pytree)
    seeded = restore_latest(learner, f"{CKPT}/r4a_s1_hs", seed=1)
    if seeded is None:
        emit(phase="session_done", ok=False, reason="no r4a_s1_hs ckpt")
        return
    emit(phase="frontier_seed", source="r4a_s1_hs")
    pin = 5.0 + (jnp.arange(NUM_ENVS) % 3 == 2).astype(jnp.float32)  # 5,5,6
    state = guarded(
        "frontier", train_phase, learner, f"{CKPT}/r4c_fr", 3000,
        "frontier", CFG, HOOKS, seed_state=seeded,
        zero_update_count=True, pin_stages=pin,
    )
    if state is None:
        st = restore_latest(learner, f"{CKPT}/r4c_fr", seed=1)
        if st is None:
            emit(phase="session_done", ok=False, failed=FAILED,
                 wall_s=round(time.time() - T0, 1))
            return
        state, _fin = st, False
    else:
        state, _fin = state

    for stage in (4, 5, 6):
        if time_left() < 300:
            emit(phase="eval", skipped="deadline", stage=stage)
            continue
        row = eval_fixed_stage(env, learner.net, state, stage, CFG, HOOKS)
        emit(phase="eval", **row)
    if time_left() > 300:
        row = eval_fixed_stage(env, learner.net, state, 5, CFG, HOOKS,
                               deterministic=False)
        emit(phase="eval", **row)

    guarded("bench", bench_policy, env, learner.net, state.params,
            state.obs_norm, "stepper_frontier_policy_b4096")

    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
