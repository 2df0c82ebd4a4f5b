"""Round-3j TPU session: train-step cost decomposition, finer cut.

3f's A/B eliminated the two prime suspects for the stepper's 2.8 s/update
(walker trains at the same rate): minibatch shuffle gathers (full→time:
−5%) and the mirror loss (on→off: ±1%). 3d's epochs/minibatches toggles
were flat — so the cost is NOT in the optimizer loop at all. What remains
is the TRAINING ROLLOUT (net-in-loop scan + trajectory storage + env
metrics) and the GAE/normalizer epilogue. This session times each layer:

  r_random : scan(vmap(env.step)) with random actions  (the bench core)
  r_policy : the learner's exact rollout (net.apply + storage + metrics)
  train    : full train_step (epochs 4 × minibatches 32)

for the walker AND the stepper at b4096 h128. Deltas assign the cost.
JSONL → scripts/tpu_round3j_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round3j_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 40 * 60))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.rollout import make_batched_rollout

B, H = 4096, 128


def guarded(gtag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=gtag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase=gtag, ok=False, error=traceback.format_exc()[-300:])
        return None


def decomp(env_id):
    env = mocca_envs_tpu.make(env_id)
    cfg = PPOConfig(horizon=H, num_epochs=4, num_minibatches=32,
                    reward_scale=0.1, log_std_min=-1.0)
    learner = PPOLearner(env, cfg, num_envs=B)
    state = learner.init(seed=0)
    net = learner.net
    params, norm = state.params, state.obs_norm

    def timeit(tag, fn, *args):
        out = fn(*args)           # compile
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        emit(phase="decomp", env=env_id, tag=tag, s=round(dt, 4),
             env_steps_per_s=round(B * H / dt))
        return dt

    # 1. random-action rollout (bench core)
    step = jax.vmap(env.step)

    @jax.jit
    def r_random(es, key):
        def body(carry, _):
            es, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1, maxval=1)
            tr = step(es, a)
            return (tr.state, key), ()

        (es, key), _ = jax.lax.scan(body, (es, key), None, length=H)
        return es

    timeit("r_random", r_random, state.env_state, jax.random.key(0))

    # 2. the learner's exact rollout (policy net + storage + env metrics)
    def policy(p, obs, key):
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10, 10)
        mean, log_std, value = net.apply(p, o)
        log_std = jnp.maximum(log_std, cfg.log_std_min)
        noise = jax.random.normal(key, mean.shape)
        action = mean + jnp.exp(log_std) * noise
        lp = jnp.sum(
            -0.5 * jnp.square(noise) - log_std - 0.5 * jnp.log(2 * jnp.pi),
            axis=-1,
        )
        return action, lp, value

    roll = jax.jit(make_batched_rollout(env, H, policy))
    obs0 = jax.vmap(env.obs_fn)(state.env_state)
    timeit("r_policy", roll, params, state.env_state, obs0,
           jax.random.key(1))

    # bisection rows: which ingredient of the policy rollout costs?
    @jax.jit
    def r_policy_nostore(es, obs, key):
        # net in the loop, trajectory NOT stored
        def body(carry, _):
            es, obs, key = carry
            key, ka = jax.random.split(key)
            a, _lp, _v = policy(params, obs, ka)
            tr = step(es, a)
            return (tr.state, tr.obs, key), ()

        (es, obs, key), _ = jax.lax.scan(
            body, (es, obs, key), None, length=H)
        return es

    timeit("r_policy_nostore", r_policy_nostore, state.env_state, obs0,
           jax.random.key(2))

    # round-4 row: policy in the loop but step WITHOUT the in-graph
    # auto-reset — isolates the reset branch (stone resample + scene
    # rebuild + obs_fn-on-fresh, computed unconditionally every step by
    # make_fn_env) from the policy/storage costs
    step_nr = jax.vmap(env.step_no_reset)

    @jax.jit
    def r_policy_noreset(es, obs, key):
        def body(carry, _):
            es, obs, key = carry
            key, ka = jax.random.split(key)
            a, _lp, _v = policy(params, obs, ka)
            tr = step_nr(es, a)
            return (tr.state, tr.obs, key), ()

        (es, obs, key), _ = jax.lax.scan(
            body, (es, obs, key), None, length=H)
        return es

    timeit("r_policy_noreset", r_policy_noreset, state.env_state, obs0,
           jax.random.key(5))

    @jax.jit
    def r_random_store(es, key):
        # random actions, but store the same trajectory slices the
        # learner stores (obs via env transitions + metrics)
        def body(carry, _):
            es, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1, maxval=1)
            tr = step(es, a)
            return (tr.state, key), (tr.obs, a, tr.reward, tr.done, tr.metrics)

        (es, key), outs = jax.lax.scan(body, (es, key), None, length=H)
        return es, outs

    timeit("r_random_store", r_random_store, state.env_state,
           jax.random.key(3))

    @jax.jit
    def net_only(obs, key):
        # the policy chain alone, H times sequentially (no env)
        def body(carry, _):
            obs, key = carry
            key, ka = jax.random.split(key)
            a, _lp, _v = policy(params, obs, ka)
            # feed a cheap function of a back in so the scan can't collapse
            obs = obs + 1e-6 * jnp.sum(a)
            return (obs, key), ()

        (obs, key), _ = jax.lax.scan(body, (obs, key), None, length=H)
        return obs

    timeit("net_only", net_only, obs0, jax.random.key(4))

    # 3. full train_step — and a clean-process epochs/minibatches toggle
    # (3d's toggle rows ran in a degraded-tunnel process; re-measure)
    def bench_train(tag, cfg2):
        lrn = PPOLearner(env, cfg2, num_envs=B)
        s = lrn.init(seed=0)
        s, _ = lrn.train_step(s)
        jax.block_until_ready(s.params)
        t0 = time.perf_counter()
        for _ in range(3):
            s, _ = lrn.train_step(s)
        jax.block_until_ready(s.params)
        dt = (time.perf_counter() - t0) / 3
        emit(phase="decomp", env=env_id, tag=tag, s=round(dt, 4),
             env_steps_per_s=round(B * H / dt))

    bench_train("train_e4_m32", cfg)
    bench_train("train_e1_m1", PPOConfig(
        horizon=H, num_epochs=1, num_minibatches=1,
        reward_scale=0.1, log_std_min=-1.0))

    # profiler trace of 2 warm train_steps → per-op device timeline for
    # offline attribution (perfetto json under profiles/). Guarded: the
    # axon plugin is experimental and device tracing may be unsupported.
    try:
        import glob

        pdir = f"/root/repo/profiles/3j_{env_id.split('-')[0]}"
        lrn = PPOLearner(env, cfg, num_envs=B)
        s = lrn.init(seed=0)
        s, _ = lrn.train_step(s)
        jax.block_until_ready(s.params)
        jax.profiler.start_trace(pdir)
        for _ in range(2):
            s, _ = lrn.train_step(s)
        jax.block_until_ready(s.params)
        jax.profiler.stop_trace()
        n = len(glob.glob(pdir + "/**/*.json.gz", recursive=True)) + len(
            glob.glob(pdir + "/**/*.xplane.pb", recursive=True))
        emit(phase="profile", env=env_id, dir=pdir, artifacts=n)
    except Exception:
        traceback.print_exc()
        emit(phase="profile", env=env_id, ok=False,
             error=traceback.format_exc()[-200:])


for env_id in ("Walker3DCustomEnv-v0", "Walker3DStepperEnv-v0",
               "Monkey3DStepperEnv-v0"):
    guarded("decomp", decomp, env_id)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
