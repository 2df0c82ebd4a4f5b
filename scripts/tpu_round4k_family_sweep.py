"""Round-4k TPU session: every-family-learns sweep.

BENCH.md's learning table covers the walker, stepper, monkey, terrain,
Walker2D and CassiePhase rows, but Crab2D, Child3D, Cassie2D and the
round-3 Walker3DStairsEnv have only THROUGHPUT rows — no demonstration
that PPO improves them on-chip. This closes the matrix: 400 updates
each (b2048, default mirror where the family ships one), emitting the
reward/speed/done trend. Not a skill claim — a "the reward machinery of
every registered family trains end-to-end on hardware" claim, the same
bar the round-2 Walker2D row set.

JSONL → scripts/tpu_round4k_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4k_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 1.5 * 3600))

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
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

FAMILIES = (
    "Crab2DCustomEnv",
    "Child3DCustomEnv",
    "Cassie2DEnv",
    "Walker3DStairsEnv",
)
NUM_ENVS = 2048
UPDATES = 400


def sweep_one(env_id):
    env = mocca_envs_tpu.make(env_id)
    cfg = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=16, lr=3e-4,
        reward_scale=0.1, log_std_min=-1.0,
        mirror_coef=4.0 if getattr(env, "mirror", None) else 0.0,
    )
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    t0 = time.time()
    first = None
    for u in range(UPDATES):
        beat()
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == 0:
            jax.block_until_ready(state.params)
            row = {
                "reward_per_step": round(float(metrics["reward_per_step"]), 4),
                "episode_done_rate": round(
                    float(metrics["episode_done_rate"]), 5),
                "speed": round(float(jnp.linalg.norm(
                    state.env_state.qd[:, 0:2], axis=1).mean()), 3),
                "env_steps_per_s": round(
                    NUM_ENVS * cfg.horizon * (50 if u else 1)
                    / max(time.time() - t0, 1e-9)),
            }
            t0 = time.time()
            if first is None:
                first = row
            emit(phase="train", env=env_id, update=u + 1, **row)
        if time_left() < 360:
            emit(phase="train", env=env_id, truncated_at=u + 1)
            break
    emit(phase="family_done", env=env_id,
         reward_first=first["reward_per_step"],
         reward_last=round(float(metrics["reward_per_step"]), 4),
         done_rate_last=round(float(metrics["episode_done_rate"]), 5))


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    for env_id in FAMILIES:
        if time_left() < 600:
            emit(phase="family_skipped", env=env_id, reason="deadline")
            continue
        try:
            sweep_one(env_id)
        except Exception:
            traceback.print_exc()
            FAILED.append(env_id)
            emit(phase="family_failed", env=env_id,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
