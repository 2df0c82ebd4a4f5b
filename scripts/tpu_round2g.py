"""Round-2g TPU session: monkey with a bar-dominated reward.

Round-2e telemetry showed the monkey's conservative-hold optimum: both
hands stay attached (holding ≈ 1.96), bar-hit rate equals the reset rate
(only the trivial bar-1 grab fires), yet a few envs advanced to stage 2
during EARLY random exploration — the grab/advance machinery supports
chains; the reward doesn't. Same failure mode as the stepper continuation:
+1.0/step alive-while-holding beats a one-time +6 bar bonus once noise
anneals. Rebalance: bar bonus 18, alive 0.3 — swinging forward is the only
way to collect.

Phases:
  A. Monkey from scratch, rebalanced reward, spacing curriculum,
     adv_threshold 6, 2500 updates → ckpt/monkey3g.
  B. Episode-end eval (bars per episode, stage histogram).

Appends JSON lines to scripts/tpu_round2g_results.jsonl.
"""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2g_results.jsonl"
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
from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams

NUM_ENVS = 4096
MP = MonkeyParams().replace(
    adv_threshold=jnp.asarray(6.0, jnp.float32),
    bar_bonus=jnp.asarray(18.0, jnp.float32),
    alive_bonus=jnp.asarray(0.3, jnp.float32),
)
MONKEY = mocca_envs_tpu.make("Monkey3DStepperEnv-v0", params=MP)
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, log_std_min=-1.0,
)

try:
    learner = PPOLearner(MONKEY, CFG, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    mgr = CheckpointManager("/root/repo/ckpt/monkey3g", max_to_keep=2)
    if mgr.latest_step() is not None:
        state = mgr.restore(state, mgr.latest_step())
        emit(phase="monkey_rebal", resumed_from=mgr.latest_step())
    t0 = time.time()
    for u in range(2500):
        state, metrics = learner.train_step(state)
        if (u + 1) % 25 == 0 or u == 0:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            task = state.env_state.task
            m["mean_bars"] = round(float(task.next_bar.mean()), 3)
            m["max_bars"] = int(task.next_bar.max())
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * CFG.horizon * (25 if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="monkey_rebal", update=u + 1, **m)
        if (u + 1) % 500 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
    mgr.save(2500, state)
    mgr.wait()
    mgr.close()

    params, norm = state.params, state.obs_norm
    net = learner.net
    env_state = state.env_state

    @jax.jit
    def eval_step(s, key):
        obs = jax.vmap(MONKEY.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        tr = jax.vmap(MONKEY.step)(s, a)
        # post-step, pre-reset count (raw_step computes metrics before the
        # auto-reset) — matches the learner's ep_end/ channel semantics
        return tr.state, tr.done, tr.metrics["bars_reached"], s.task.stage

    key = jax.random.key(7)
    done_bars, done_stage = [], []
    for t in range(600):
        key, ka = jax.random.split(key)
        env_state, done, pre, stage = eval_step(env_state, ka)
        d = np.asarray(done)
        if d.any():
            done_bars.append(np.asarray(pre)[d])
            done_stage.append(np.asarray(stage)[d])
    db = np.concatenate(done_bars) if done_bars else np.zeros(1)
    dg = np.concatenate(done_stage) if done_stage else np.zeros(1)
    emit(
        phase="eval_monkey_rebal", episodes=int(db.size),
        ep_end_bars_mean=round(float(db.mean()), 2),
        ep_end_bars_p90=float(np.percentile(db, 90)),
        frac_ge_4=round(float((db >= 4).mean()), 3),
        stage_mean=round(float(dg.mean()), 2),
        stage_max=float(dg.max()),
    )
except Exception:
    traceback.print_exc()
    emit(phase="monkey_rebal", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2G SESSION DONE in {time.time()-T0:.0f}s", flush=True)
