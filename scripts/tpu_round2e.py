"""Round-2e TPU session: monkey spacing-curriculum run + remaining benches.

Runs after tpu_round2d.py. Collects:
  A. Benches under the NEW defaults (block-PGS@8): headline walker, cassie
     block-only (2d measured reuse variants; this isolates block), stepper,
     terrain, monkey.
  B. Monkey3DStepperEnv from scratch with the bar-spacing curriculum
     (stage-0 bars within double-arm reach — 9a10954) and per-env advance
     at adv_threshold=6: the 2c run plateaued at bar 2 with fixed spacing.
  C. Episode-end monkey evaluation (bars reached per episode).

Appends JSON lines to scripts/tpu_round2e_results.jsonl.
Run:  cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_round2e.py
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2e_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks.cassie_task import CASSIE_CONFIG, make_cassie
from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams

NUM_ENVS = 4096


def bench_env(env, steps=50, reps=3, num_envs=NUM_ENVS):
    keys = rng_mod.env_keys(rng_mod.root_key(0), num_envs)
    st = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def timed(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(s, a)
            return (tr.state, k), ()

        (s, k), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return s, k

    st, k = timed(st, jax.random.key(1))
    jax.block_until_ready(st.q)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st, k = timed(st, k)
        jax.block_until_ready(st.q)
        best = min(best, time.perf_counter() - t0)
    return num_envs * steps / best


# ---------------- A: benches under new defaults
for tag, thunk in (
    ("walker_default", lambda: mocca_envs_tpu.make("Walker3DCustomEnv-v0")),
    ("walker_default_b16384", None),
    ("cassie_block8", lambda: make_cassie(
        config=dataclasses.replace(CASSIE_CONFIG, block_pgs=True, solver_iters=8))),
    ("cassie_pinned", lambda: make_cassie()),
    ("stepper_default", lambda: mocca_envs_tpu.make("Walker3DStepperEnv-v0")),
    ("terrain_default", lambda: mocca_envs_tpu.make("Walker3DTerrainEnv-v0")),
    ("monkey_default", lambda: mocca_envs_tpu.make("Monkey3DStepperEnv-v0")),
):
    try:
        if tag == "walker_default_b16384":
            r = bench_env(mocca_envs_tpu.make("Walker3DCustomEnv-v0"), num_envs=16384)
        else:
            r = bench_env(thunk())
        emit(phase="bench", tag=tag, env_steps_per_s=round(r),
             vs_north_star=round(r / 1e6, 3))
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=tag, ok=False, error=traceback.format_exc()[-300:])

# ---------------- B: monkey from scratch, spacing curriculum
MP = MonkeyParams().replace(adv_threshold=jnp.asarray(6.0, jnp.float32))
MONKEY = mocca_envs_tpu.make("Monkey3DStepperEnv-v0", params=MP)
cfg_m = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, log_std_min=-1.0,
)
try:
    learner = PPOLearner(MONKEY, cfg_m, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    mgr = CheckpointManager("/root/repo/ckpt/monkey3e", max_to_keep=2)
    if mgr.latest_step() is not None:
        state = mgr.restore(state, mgr.latest_step())
        emit(phase="monkey_curr", resumed_from=mgr.latest_step())
    t0 = time.time()
    for u in range(2000):
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
                NUM_ENVS * cfg_m.horizon * (25 if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="monkey_curr", update=u + 1, **m)
        if (u + 1) % 500 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
    mgr.save(2000, state)
    mgr.wait()
    mgr.close()

    # ---------------- C: episode-end evaluation
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
        pre = s.task.next_bar
        tr = jax.vmap(MONKEY.step)(s, a)
        return tr.state, tr.done, pre, s.task.stage

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
        phase="eval_monkey", episodes=int(db.size),
        ep_end_bars_mean=round(float(db.mean()), 2),
        ep_end_bars_p90=float(np.percentile(db, 90)),
        frac_ge_4=round(float((db >= 4).mean()), 3),
        stage_mean=round(float(dg.mean()), 2),
        stage_max=float(dg.max()),
    )
except Exception:
    traceback.print_exc()
    emit(phase="monkey_curr", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2E SESSION DONE in {time.time()-T0:.0f}s", flush=True)
