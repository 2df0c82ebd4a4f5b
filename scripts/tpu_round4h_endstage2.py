"""Round-4h TPU session: end-stage assault #2 — exploration re-opening.

4d's diagnosis (BENCH.md): the progressive frontier transfers skill
+0.6–0.8 stones per rung up to stage 7, then stalls at 8 with entropy
pinned at the −2.0 floor (σ≈0.14) — exploration starvation — and full
pinning at 8/8/9 costs stage-5 skill (8.95→7.29), mild forgetting.
This session attacks both:

P1 reopen — from the stage-7 rung checkpoint (r4d_f7, before the
  forgetting), RETENTION mixture pins (uniform over stages 5/6/7/8) with
  the floor RELAXED to −1.5 (σ≈0.22) for 3000 u: re-discover long risky
  steps with noise while rehearsing the mid stages.
P2 reanneal — same pins, floor annealed −1.5 → −2.25 over 1500 u:
  consolidate what the noise found into the deterministic policy.
P3 ladder — det evals at 5/6/7/8/9 (+ 8 stoch), row-comparable to 4d.
P4 finish — if ≥25 min left: 8/8/9 dwell 1500 u at floor −2.25 from the
  P2 state, then re-eval 8/9.

JSONL → scripts/tpu_round4h_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4h_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.5 * 3600))

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


import mocca_envs_tpu  # noqa: F401
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

BASE = dict(num_envs=NUM_ENVS, seed=1, eval_steps=700)
CFG_REOPEN = AllstepsConfig(
    ckpt_root=f"{CKPT}/r4h", floor_explore=-1.5, floor_final=-1.5,
    floor_anneal_updates=0, **BASE,
)
CFG_ANNEAL = AllstepsConfig(
    ckpt_root=f"{CKPT}/r4h", floor_explore=-1.5, floor_final=-2.25,
    floor_anneal_updates=1500, **BASE,
)
CFG_FINISH = AllstepsConfig(
    ckpt_root=f"{CKPT}/r4h", floor_explore=-2.25, floor_final=-2.25,
    floor_anneal_updates=0, **BASE,
)

HOOKS = RunHooks(emit=emit, beat=beat, time_left=time_left)


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))

    env = make_walker3d_stepper(
        params=CFG_REOPEN.stepper_params(pinned=True), name="Stepper4h"
    )
    # the floor schedule is static PPOConfig data, so each phase gets its
    # own learner; the TrainState pytree is learner-independent and flows
    # straight through (update_count zeroed per phase restarts the anneal)
    learner_reopen = PPOLearner(env, CFG_REOPEN.ppo(), num_envs=NUM_ENVS)
    learner_anneal = PPOLearner(
        env,
        CFG_ANNEAL.ppo(log_std_min_final=CFG_ANNEAL.floor_final,
                       log_std_anneal_updates=CFG_ANNEAL.floor_anneal_updates),
        num_envs=NUM_ENVS,
    )
    learner_finish = PPOLearner(env, CFG_FINISH.ppo(), num_envs=NUM_ENVS)
    learner = learner_finish  # for the eval net (same architecture)

    state = restore_latest(learner_reopen, f"{CKPT}/r4d_f7", seed=1)
    if state is None:
        emit(phase="session_done", ok=False, reason="no r4d_f7 ckpt")
        return
    emit(phase="seed", source="r4d_f7")

    pins_mix = (5.0 + (jnp.arange(NUM_ENVS) % 4)).astype(jnp.float32)

    def run(tag, leaf, lrn, cfg, n, pin, seed_state):
        # fresh COPY per phase: the seeding writes `pin` into the state
        # pytree and the phase's first train_step DONATES it — a shared
        # array would be dead for the next phase (bit this session:
        # reanneal crashed on the reopen-donated pins buffer)
        out = guarded(tag, train_phase, lrn, f"{CKPT}/{leaf}", n,
                      tag, cfg, HOOKS, seed_state=seed_state,
                      zero_update_count=True, pin_stages=jnp.array(pin))
        if out is None:
            return restore_latest(lrn, f"{CKPT}/{leaf}", seed=1)
        return out[0]

    state = run("reopen", "r4h_open", learner_reopen, CFG_REOPEN, 3000,
                pins_mix, state)
    if state is None:
        emit(phase="session_done", ok=False, failed=FAILED)
        return
    state = run("reanneal", "r4h_anneal", learner_anneal, CFG_ANNEAL, 1500,
                pins_mix, state)
    if state is None:
        emit(phase="session_done", ok=False, failed=FAILED)
        return

    for stage in (5, 6, 7, 8, 9):
        if time_left() < 300:
            emit(phase="eval", skipped="deadline", stage=stage)
            continue
        row = eval_fixed_stage(env, learner.net, state, stage,
                               CFG_ANNEAL, HOOKS)
        emit(phase="eval", after="reanneal", **row)
    if time_left() > 300:
        row = eval_fixed_stage(env, learner.net, state, 8, CFG_ANNEAL,
                               HOOKS, deterministic=False)
        emit(phase="eval", after="reanneal", **row)

    if time_left() > 1500:
        pin89 = 8.0 + (jnp.arange(NUM_ENVS) % 3 == 2).astype(jnp.float32)
        state = run("finish", "r4h_fin", learner_finish, CFG_FINISH, 1500,
                    pin89, state)
        if state is not None:
            for stage in (8, 9):
                if time_left() < 300:
                    break
                row = eval_fixed_stage(env, learner.net, state, stage,
                                       CFG_FINISH, HOOKS)
                emit(phase="eval", after="finish", **row)

    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
