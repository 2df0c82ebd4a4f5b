"""Round-5a TPU session: end-stage assault #3 — near-miss shaping +
sub-stage pins, READY TO LAUNCH IN MINUTE ONE of the next session.

The round-4 conclusion (BENCH.md "end-stage assault"): the stage-8 wall
(~4.7 ep-end det) is recipe-independent at (256,256) — both progressive
frontier dwells (4d) and exploration reopen+reanneal (4h) land on it.
Round-5 landed two untried levers, both exercised here:

1. **Near-miss shaping** (`StepperParams.w_nearmiss`, gated
   tests/test_stepper.py::test_nearmiss_shaping_is_optional_and_consistent):
   dense potential on the swing foot's 3-D distance to the target stone.
   At stage 8 (r→1.29 m, pitch ±47°) the root-xy progress term barely
   separates a near-miss from a short step; the foot term does.
2. **Sub-stage pins**: stages interpolate continuously
   (terrain/stones.py frac = stage/max), so the 7→9 range jump can be
   climbed in 0.5-stage rungs — pins 7.0/7.5/8.0/8.5 instead of 8/8/9.

Checkpoints DO NOT survive across rounds (fresh machine each round), so
this runs the full pipeline from scratch: P1 pretrain → P2 transfer →
P3 high-stage dwell (all checkpoint-resumable, ~45 min at b4096 after
the reset-obs fix) with w_nearmiss=0.05 from P2 on, then the 4h-style
reopen (floor −1.5, sub-stage retention mixture) → reanneal (−2.25) →
fixed-stage det ladder 5..9. Honest bar: stage-8 det ep-end ≥ 8.

JSONL → scripts/tpu_round5a_results.jsonl. Budget ≥ 2.5 h; every phase
truncates at MOCCA_QUEUE_DEADLINE and resumes on relaunch.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round5a_results.jsonl"
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
W_NEARMISS = 0.05   # ~1/4 of w_progress's scale; foot Δdist ≈ root Δdist

BASE = dict(num_envs=NUM_ENVS, seed=1, eval_steps=700,
            w_nearmiss=W_NEARMISS)
CFG_PIPE = AllstepsConfig(ckpt_root=f"{CKPT}/r6a", **BASE)
CFG_REOPEN = AllstepsConfig(
    ckpt_root=f"{CKPT}/r6a", floor_explore=-1.5, floor_final=-1.5,
    floor_anneal_updates=0, **BASE,
)
CFG_ANNEAL = AllstepsConfig(
    ckpt_root=f"{CKPT}/r6a", floor_explore=-1.5, floor_final=-2.25,
    floor_anneal_updates=1500, **BASE,
)

HOOKS = RunHooks(emit=emit, beat=beat, time_left=time_left)


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()),
         w_nearmiss=W_NEARMISS)

    out = guarded("pipeline", run_allsteps, CFG_PIPE, HOOKS)
    if out is None or not out.get("highstage_finished", False):
        emit(phase="session_done", ok=False, failed=FAILED or ["pipeline"],
             note="pipeline incomplete — relaunch resumes from ckpt",
             wall_s=round(time.time() - T0, 1))
        return
    emit(phase="pipeline_done",
         **{k: v for k, v in out.items() if k != "config" and
            not isinstance(v, (dict, list))})

    env = make_walker3d_stepper(
        params=CFG_REOPEN.stepper_params(pinned=True), name="Stepper6a"
    )
    learner_reopen = PPOLearner(env, CFG_REOPEN.ppo(), num_envs=NUM_ENVS)
    learner_anneal = PPOLearner(
        env,
        CFG_ANNEAL.ppo(log_std_min_final=CFG_ANNEAL.floor_final,
                       log_std_anneal_updates=CFG_ANNEAL.floor_anneal_updates),
        num_envs=NUM_ENVS,
    )

    state = restore_latest(learner_reopen, f"{CKPT}/r6a/s1/hs", seed=1)
    if state is None:
        emit(phase="session_done", ok=False, reason="no hs ckpt")
        return

    # sub-stage retention mixture: 7.0/7.5/8.0/8.5 (stones interpolate
    # continuously; 4h's integer mixture 5/6/7/8 retained mid stages —
    # this one dwells the 7→9 jump in half-stage rungs)
    pins_sub = (7.0 + 0.5 * (jnp.arange(NUM_ENVS) % 4)).astype(jnp.float32)

    def run(tag, leaf, lrn, cfg, n, pin, seed_state):
        # fresh copy per phase: train_step DONATES; pins written into the
        # state pytree would be dead buffers for the next phase otherwise
        out = guarded(tag, train_phase, lrn, f"{CKPT}/{leaf}", n,
                      tag, cfg, HOOKS, seed_state=seed_state,
                      zero_update_count=True, pin_stages=jnp.array(pin))
        if out is None:
            return None, False
        return out  # (state, finished)

    # ADVICE r4 (medium): a deadline-truncated phase must END the session
    # — continuing would seed the next phase from a half-trained state
    # and pollute its checkpoint; the relaunch resumes from this phase's
    # own ckpt instead (train_phase prefers ckpt_dir over seed_state).
    state, finished = run("reopen", "r6a_open", learner_reopen, CFG_REOPEN,
                          3000, pins_sub, state)
    if state is None or not finished:
        emit(phase="session_done", ok=False, failed=FAILED or ["reopen"],
             note="reopen truncated — relaunch resumes from r6a_open ckpt")
        return
    state, finished = run("reanneal", "r6a_anneal", learner_anneal,
                          CFG_ANNEAL, 1500, pins_sub, state)
    if state is None or not finished:
        emit(phase="session_done", ok=False, failed=FAILED or ["reanneal"],
             note="reanneal truncated — relaunch resumes from r6a_anneal "
                  "ckpt")
        return

    evals_ok = 0
    for stage in (5, 6, 7, 8, 9):
        if time_left() < 300:
            emit(phase="eval", skipped="deadline", stage=stage)
            continue
        row = eval_fixed_stage(env, learner_anneal.net, state, stage,
                               CFG_ANNEAL, HOOKS)
        emit(phase="eval", after="reanneal_sub", **row)
        if row.get("episodes") and not row.get("truncated"):
            evals_ok += 1

    done = (not FAILED) and evals_ok == 5
    if done:
        # sentinel for the queue launcher's relaunch loop
        with open("scripts/R5A_DONE", "w") as f:
            f.write(json.dumps({"wall_s": round(time.time() - T0, 1)}))
    emit(phase="session_done", ok=done, failed=FAILED, evals_ok=evals_ok,
         wall_s=round(time.time() - T0, 1))


main()
