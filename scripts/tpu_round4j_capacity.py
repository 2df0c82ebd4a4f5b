"""Round-4j TPU session: the CAPACITY hypothesis for the stage-8 wall.

4d and 4h converged on the same stage-8 plateau (~4.7 ep-end stones)
from two different fine-tuning paths, so the wall is not a recipe
artifact of either. BENCH.md names capacity first among the remaining
hypotheses: the (256,256) policy may simply not represent the
state-dependent step adjustments the ±50° pitch / ±25° tilt / 1.35 m
end stages demand. Test: run the IDENTICAL pipeline at hidden
(512,512) — pretrain → stepper transfer → pinned high-stage dwell (the
harness/allsteps.py CLI path, checkpoint-resumable) — then a 5/5/6
frontier dwell and a 5..9 ladder, row-comparable to 4d/4h. Per-update
cost is ~2× but the reset-obs fix pays for it.

JSONL → scripts/tpu_round4j_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4j_results.jsonl"
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
    run_allsteps,
    train_phase,
)
from mocca_envs_tpu.harness.ppo import PPOLearner
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"

CFG = AllstepsConfig(
    num_envs=NUM_ENVS,
    seed=1,
    ckpt_root=f"{CKPT}/r4j",
    hidden=(512, 512),
    eval_steps=700,
    eval_stages=(4, 5),          # pipeline's own quick ladder; full below
)

HOOKS = RunHooks(emit=emit, beat=beat, time_left=time_left)


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()),
         hidden=list(CFG.hidden))

    out = guarded("pipeline", run_allsteps, CFG, HOOKS)
    if out is None or not out.get("highstage_finished", False):
        emit(phase="session_done", ok=False, failed=FAILED or ["pipeline"],
             note="pipeline incomplete", wall_s=round(time.time() - T0, 1))
        return
    emit(phase="pipeline_done",
         **{k: v for k, v in out.items() if k != "config" and
            not isinstance(v, (dict, list))})

    # frontier dwell at 5/5/6 (the 4c recipe) from the hs checkpoint
    env = make_walker3d_stepper(
        params=CFG.stepper_params(pinned=True), name="Stepper4j"
    )
    dwell_cfg = AllstepsConfig(
        num_envs=NUM_ENVS, seed=1, ckpt_root=f"{CKPT}/r4j",
        hidden=(512, 512), floor_explore=-2.0, floor_final=-2.0,
        floor_anneal_updates=0, eval_steps=700,
    )
    learner = PPOLearner(env, dwell_cfg.ppo(), num_envs=NUM_ENVS)
    seeded = restore_latest(learner, f"{CKPT}/r4j/s1/hs", seed=1)
    if seeded is None:
        emit(phase="session_done", ok=False, reason="no hs ckpt",
             wall_s=round(time.time() - T0, 1))
        return
    pin = 5.0 + (jnp.arange(NUM_ENVS) % 3 == 2).astype(jnp.float32)
    res = guarded(
        "frontier", train_phase, learner, f"{CKPT}/r4j_fr", 2500,
        "frontier", dwell_cfg, HOOKS, seed_state=seeded,
        zero_update_count=True, pin_stages=jnp.array(pin),
    )
    if res is None:
        state = restore_latest(learner, f"{CKPT}/r4j_fr", seed=1)
        frontier_finished = False
        if state is None:
            emit(phase="session_done", ok=False, failed=FAILED,
                 wall_s=round(time.time() - T0, 1))
            return
    else:
        state, frontier_finished = res

    # evals still run on a truncated frontier (a capacity probe's rough
    # answer beats no answer) but every row says so (ADVICE-r4 class fix)
    for stage in (5, 6, 7, 8):
        if time_left() < 300:
            emit(phase="eval", skipped="deadline", stage=stage)
            continue
        row = eval_fixed_stage(env, learner.net, state, stage, dwell_cfg,
                               HOOKS)
        emit(phase="eval", after="frontier512",
             frontier_finished=bool(frontier_finished), **row)

    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
