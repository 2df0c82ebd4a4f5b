"""Round-3d TPU session: re-measure stone culling with the one-hot select.

3a measured the gather-based cull LOSING 38% (stepper window8 2.54M vs
window0 4.08M env-steps/s): the per-env `stone_pos[idx]` gather scalarizes
under vmap on TPU. cull_stones/cull_tris now select through a
(W,K)@(K,11) HIGHEST-precision one-hot contraction instead. This session
re-sweeps the stepper windows and, if culling still loses, the right
default is stone_window=0 (flip in utils/config.py and re-gate).

JSONL → scripts/tpu_round3d_results.jsonl.
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

OUT = "scripts/tpu_round3d_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 25 * 60))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper
from mocca_envs_tpu.utils.config import EngineConfig


def bench_env(env, B=4096, T=600, rounds=3, tag=""):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    key = jax.random.key(1)
    tC = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - tC
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        times.append(time.perf_counter() - t0)
    rate = B * T / min(times)
    emit(phase="bench", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(rate),
         all_round_s=[round(x, 4) for x in times],
         compile_s=round(compile_s, 1),
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         z_mean=round(float(state.q[:, 2].mean()), 3))
    return rate


for win in (0, 6, 8, 12):
    if time.time() > DEADLINE:
        emit(phase="skipped", tag=f"win{win}", reason="deadline")
        continue
    try:
        bench_env(
            make_walker3d_stepper(config=EngineConfig(stone_window=win),
                                  name=f"StepperOH{win}"),
            tag=f"stepper_onehot_window{win}",
        )
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"win{win}", ok=False,
             error=traceback.format_exc()[-300:])

# ---- learner-cost decomposition: training runs at ~1.3M steps/s on the
# walker while the physics alone does 11.6M — locate the other ~85%.
# Variants toggle one suspect each; deltas assign the cost.
def bench_train(tag, cfg_kwargs, env=None):
    import mocca_envs_tpu
    from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

    env = env or mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    cfg = PPOConfig(log_std_min=-1.0, **{"horizon": 128, **cfg_kwargs})
    learner = PPOLearner(env, cfg, num_envs=4096)
    state = learner.init(seed=0)
    state, _ = learner.train_step(state)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    N = 5
    for _ in range(N):
        state, _ = learner.train_step(state)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / N
    emit(phase="train_decomp", tag=tag, s_per_update=round(dt, 4),
         env_steps_per_s=round(4096 * cfg.horizon / dt))
    return dt


if time.time() < DEADLINE:
    try:
        bench_train("walker_full_m32e4_mirror", dict(
            num_epochs=4, num_minibatches=32, mirror_coef=4.0,
            reward_scale=0.1))
        bench_train("walker_no_mirror", dict(
            num_epochs=4, num_minibatches=32, reward_scale=0.1))
        bench_train("walker_e1_m32", dict(
            num_epochs=1, num_minibatches=32, reward_scale=0.1))
        bench_train("walker_e1_m1", dict(
            num_epochs=1, num_minibatches=1, reward_scale=0.1))
    except Exception:
        traceback.print_exc()
        emit(phase="train_decomp", ok=False,
             error=traceback.format_exc()[-300:])

# the stepper trains ~7x SLOWER than the walker (2.85 vs 0.40 s/update at
# b4096) while its ROLLOUT costs only +0.08s — locate the other ~2.3s
if time.time() < DEADLINE:
    try:
        sw = make_walker3d_stepper(name="DecompStepper")
        bench_train("stepper_full_m32e4_mirror", dict(
            num_epochs=4, num_minibatches=32, mirror_coef=4.0,
            reward_scale=0.1), env=sw)
        bench_train("stepper_no_mirror", dict(
            num_epochs=4, num_minibatches=32, reward_scale=0.1), env=sw)
        bench_train("stepper_e1_m1", dict(
            num_epochs=1, num_minibatches=1, reward_scale=0.1), env=sw)
        bench_train("stepper_e1_m1_nomirror_h16", dict(
            num_epochs=1, num_minibatches=1, horizon=16,
            reward_scale=0.1), env=sw)
    except Exception:
        traceback.print_exc()
        emit(phase="train_decomp", ok=False,
             error=traceback.format_exc()[-300:])

# roofline candidate: fewer PGS sweeps under warm start (walker). NOT a
# shipping change — physics gates must pass first; this just measures the
# available headroom (BENCH.md round-3 roofline statement).
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom

for iters in (3,):
    if time.time() > DEADLINE:
        emit(phase="skipped", tag=f"walker_iters{iters}", reason="deadline")
        continue
    try:
        os.environ["MOCCA_TILE"] = "2048"
        bench_env(
            make_walker3d_custom(config=EngineConfig(solver_iters=iters),
                                 name=f"WalkerIt{iters}"),
            tag=f"walker_iters{iters}_tile2048",
        )
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"walker_iters{iters}", ok=False)
    finally:
        os.environ.pop("MOCCA_TILE", None)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
