"""Round-4e TPU session: seed-2 replication of the 4c frontier dwell.

4c lifted seed-1's fixed-stage-5 det ep-end from 7.31 to 8.55 (the
VERDICT r2 #1 bar) by pinning every env to the 5/5/6 frontier for 3000
updates. This runs the identical recipe from seed-2's high-stage
checkpoint (r4a_s2_hs) so the HEADLINE row itself is two-seed, not just
the feeding pipeline.  JSONL → scripts/tpu_round4e_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4e_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.0 * 3600))

FAILED = []


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    kw["seed"] = 2
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
    seed=2,
    ckpt_root=f"{CKPT}/r4e",
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


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))

    env = make_walker3d_stepper(
        params=CFG.stepper_params(pinned=True),
        name="Stepper4eS2Frontier",
    )
    learner = PPOLearner(env, CFG.ppo(), num_envs=NUM_ENVS)

    seeded = restore_latest(learner, f"{CKPT}/r4a_s2_hs", seed=2)
    if seeded is None:
        emit(phase="session_done", ok=False, reason="no r4a_s2_hs ckpt")
        return
    emit(phase="frontier_seed", source="r4a_s2_hs")
    pin = 5.0 + (jnp.arange(NUM_ENVS) % 3 == 2).astype(jnp.float32)  # 5,5,6
    out = guarded(
        "frontier", train_phase, learner, f"{CKPT}/r4e_fr", 3000,
        "frontier", CFG, HOOKS, seed_state=seeded,
        zero_update_count=True, pin_stages=pin,
    )
    if out is None:
        state = restore_latest(learner, f"{CKPT}/r4e_fr", seed=2)
        if state is None:
            emit(phase="session_done", ok=False, failed=FAILED,
                 wall_s=round(time.time() - T0, 1))
            return
    else:
        state = out[0]

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

    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
