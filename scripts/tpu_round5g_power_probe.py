"""Round-5g TPU probe: is the stage-7/8 wall CAPABILITY-limited?

After four interventions landed on the same stage-7/8 numbers (4d/4h
recipes, 5a shaping+granularity, 4j 2x capacity), the two surviving
hypotheses are (a) physical capability of the reconstructed model at
end-stage geometry and (b) qualitatively different exploration. This
probe tests (a) EVAL-ONLY in ~15 min: score the committed 4j (512,512)
frontier policy at pinned stages 7/8 under a power assist
(params.walker.power in {1.0 control, 1.2, 1.4} - the B2 torque map's
global scale, a dynamic param). If +20-40% strength rescues the
existing strategy (ep-end jumps well past ~4.7), the wall is the
robot's strength/geometry envelope under the [K-med] reconstructed
constants - i.e. likely PHYSICS, and the ALLSTEPS-style fix is a
power-assist curriculum annealed off (hypothesis b's shape). If the
scores barely move, the policy simply lacks end-stage strategies and
exploration is the front.

JSONL -> scripts/tpu_round5g_results.jsonl.
Ref: ALLSTEPS paper assist experiments; SURVEY §2.2 B2/B6.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round5g_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 0.6 * 3600))

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
from mocca_envs_tpu.harness.allsteps import (
    AllstepsConfig,
    RunHooks,
    eval_fixed_stage,
    restore_latest,
)
from mocca_envs_tpu.harness.ppo import PPOLearner
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"
HOOKS = RunHooks(emit=emit, beat=beat, time_left=time_left)

CFG = AllstepsConfig(
    num_envs=NUM_ENVS, seed=1, ckpt_root=f"{CKPT}/r4j",
    hidden=(512, 512), floor_explore=-2.0, floor_final=-2.0,
    floor_anneal_updates=0, eval_steps=700,
)


def powered_env(power: float):
    f = lambda v: jnp.asarray(v, jnp.float32)
    sp = CFG.stepper_params(pinned=True)
    sp = sp.replace(walker=sp.walker.replace(power=f(power)))
    return make_walker3d_stepper(params=sp, name=f"Stepper5gP{power}")


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()),
         hidden=list(CFG.hidden))
    env0 = powered_env(1.0)
    learner = PPOLearner(env0, CFG.ppo(), num_envs=NUM_ENVS)
    state = restore_latest(learner, f"{CKPT}/r4j_fr", seed=1)
    if state is None:
        emit(phase="session_done", ok=False, reason="no r4j_fr ckpt")
        return
    emit(phase="restored", source="r4j_fr")

    for power in (1.0, 1.2, 1.4):
        env = env0 if power == 1.0 else powered_env(power)
        for stage in (7, 8):
            if time_left() < 200:
                emit(phase="eval", skipped="deadline", power=power,
                     stage=stage)
                continue
            try:
                row = eval_fixed_stage(env, learner.net, state, stage,
                                       CFG, HOOKS)
                emit(phase="eval", power=power, policy="4j_frontier512",
                     **row)
            except Exception:
                traceback.print_exc()
                FAILED.append(f"p{power}s{stage}")
                emit(phase="eval", power=power, stage=stage, ok=False,
                     error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
