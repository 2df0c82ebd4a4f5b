"""Round-2m TPU session: regenerate the flat-ground pretrain checkpoint.

The workspace is fresh each driver session and ckpt/ is gitignored, so the
pretrain3 checkpoint that tpu_round2j.py transfers from no longer exists.
This reruns the VALIDATED pretrain recipe (tpu_allsteps3.py phase B: mirror
PPO, exploration floor -1.0, early stop when the batch walks >1.2 m/s with
<1%/step episode ends) and saves ckpt/pretrain3. ~10-15 min on one chip.

Appends JSON lines to scripts/tpu_round2m_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2m_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

NUM_ENVS = 4096
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
)

try:
    walker = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    learner = PPOLearner(walker, CFG, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    mgr = CheckpointManager("/root/repo/ckpt/pretrain3", max_to_keep=2)
    start_u = 0
    latest = mgr.latest_step()
    if latest is not None:
        state = mgr.restore(state, latest)
        start_u = latest
        emit(phase="pretrain", resumed_from=latest)
    t0 = time.time()
    for u in range(start_u, 3000):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start_u:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            qd = state.env_state.qd
            m["speed"] = round(float(jnp.linalg.norm(qd[:, 0:2], axis=1).mean()), 3)
            m["env_steps_per_s"] = round(
                NUM_ENVS * CFG.horizon * (50 if u > start_u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="pretrain", update=u + 1, **m)
            if (u + 1) % 250 == 0:
                mgr.save(u + 1, state)
                mgr.wait()
            if m["speed"] > 1.2 and m["episode_done_rate"] < 0.01:
                emit(phase="pretrain", update=u + 1, early_stop=True)
                break
    mgr.save(u + 1, state)
    mgr.wait()
    mgr.close()
except Exception:
    traceback.print_exc()
    emit(phase="pretrain", ok=False, error=traceback.format_exc()[-300:])
    raise SystemExit(1)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2M SESSION DONE in {time.time()-T0:.0f}s", flush=True)
