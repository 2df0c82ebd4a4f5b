"""Round-4f TPU session: solver-sweep × tile perf matrix + gates.

BENCH.md's roofline statement (VERDICT r2 #9) leaves a ~1.4× schedule gap
at B=4096 with two candidates: sweep-count reduction and double-buffered
BlockSpecs. This session measures the first. CPU evidence already in
hand: the ball behavioral gates (rest height, roll-without-slip,
frictionless glide) pass at solver_iters=3 — warm start converges the
easy rows — and a 400-step random-torque walker stays finite and
grounded (z̄ 0.89 vs 0.88 at iters=4).

Matrix: walker random-torque at iters {4,3,2} × tile {2048,1024} ×
B {4096,16384}, stepper spot rows, then two acceptance gates on
hardware: (a) fused-kernel vs XLA-oracle single-control-step agreement
at iters=3 (per-env MEDIAN |Δq|, p99 reported — single contact-margin
flips give cm outliers, see verify notes), (b) the seed-1 pretrain
policy (trained at iters=4) rolled out under iters=3 physics must still
walk (speed/z̄/done-rate vs its iters=4 rollout).

Default stays solver_iters=4 unless ALL gates pass and the win is ≥4%;
this session only measures. JSONL → scripts/tpu_round4f_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4f_results.jsonl"
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
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.utils.config import EngineConfig


def bench_random(env, tag, B, T=600, rounds=3):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(
                ka, (B, env.act_dim), minval=-1.0, maxval=1.0
            )
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    key = jax.random.key(1)
    t0 = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        beat()
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        best = min(best, time.perf_counter() - t0)
    emit(phase="bench", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(B * T / best),
         ms_per_step=round(best / T * 1e3, 4),
         compile_s=round(compile_s, 1),
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         z_mean=round(float(state.q[:, 2].mean()), 2))


def walker_matrix():
    from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom

    cells = [
        ("w_i4_t2048_b4096", 4, 2048, 4096),
        ("w_i3_t2048_b4096", 3, 2048, 4096),
        ("w_i3_t1024_b4096", 3, 1024, 4096),
        ("w_i2_t2048_b4096", 2, 2048, 4096),
        ("w_i4_t2048_b16384", 4, 2048, 16384),
        ("w_i3_t2048_b16384", 3, 2048, 16384),
    ]
    for tag, iters, tile, B in cells:
        os.environ["MOCCA_TILE"] = str(tile)
        env = make_walker3d_custom(
            config=EngineConfig(solver_iters=iters), name=f"W{tag}"
        )
        guarded(tag, bench_random, env, tag, B)
    os.environ.pop("MOCCA_TILE", None)


def stepper_spot():
    from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

    for tag, iters in (("st_i4_b4096", 4), ("st_i3_b4096", 3)):
        env = make_walker3d_stepper(
            config=EngineConfig(solver_iters=iters), name=f"S{tag}"
        )
        guarded(tag, bench_random, env, tag, 4096)


def kernel_oracle_gate(iters=3, B=1024, steps=20):
    """Median per-env |Δq| between fused kernel and XLA oracle over a
    short random-torque rollout from identical states."""
    from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom

    os.environ.pop("MOCCA_TILE", None)
    envs = {
        path: make_walker3d_custom(
            config=EngineConfig(solver_iters=iters, use_pallas=use),
            name=f"KO{iters}{path}",
        )
        for path, use in (("kernel", True), ("oracle", False))
    }
    keys = rng_mod.env_keys(rng_mod.root_key(3), B)
    states = {
        p: jax.jit(jax.vmap(e.init))(keys) for p, e in envs.items()
    }
    steppers = {p: jax.jit(jax.vmap(e.step)) for p, e in envs.items()}
    key = jax.random.key(5)
    max_med = 0.0
    max_p99 = 0.0
    for t in range(steps):
        beat()
        key, ka = jax.random.split(key)
        a = jax.random.uniform(
            ka, (B, envs["kernel"].act_dim), minval=-1.0, maxval=1.0
        )
        for p in states:
            states[p] = steppers[p](states[p], a).state
        dq = np.abs(
            np.asarray(states["kernel"].q) - np.asarray(states["oracle"].q)
        ).max(axis=1)
        max_med = max(max_med, float(np.median(dq)))
        max_p99 = max(max_p99, float(np.percentile(dq, 99)))
        # resync so errors measure ONE step, not chaotic accumulation
        states["oracle"] = states["kernel"]
    emit(phase="kernel_oracle", iters=iters, batch=B, steps=steps,
         max_median_dq=max_med, max_p99_dq=max_p99,
         gate_pass=bool(max_med < 1e-4))


def policy_gate():
    """Seed-1 pretrain policy (trained at iters=4) under iters∈{4,3}."""
    from mocca_envs_tpu.harness.allsteps import AllstepsConfig, restore_latest
    from mocca_envs_tpu.harness.ppo import PPOLearner
    from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom

    cfg = AllstepsConfig()
    B, T = 4096, 600
    env4 = make_walker3d_custom(
        config=EngineConfig(solver_iters=4), name="PG4"
    )
    learner = PPOLearner(env4, cfg.ppo(), num_envs=cfg.num_envs)
    state = restore_latest(learner, "/root/repo/ckpt/r4a_s1_pre", seed=1)
    if state is None:
        emit(phase="policy_gate", skipped="no r4a_s1_pre ckpt")
        return
    params, norm = state.params, state.obs_norm
    net = learner.net

    for iters in (4, 3):
        env = make_walker3d_custom(
            config=EngineConfig(solver_iters=iters), name=f"PG{iters}x"
        )
        keys = rng_mod.env_keys(rng_mod.root_key(11), B)
        s = jax.jit(jax.vmap(env.init))(keys)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def rollout(s, obs, _env=env):
            def body(carry, _):
                s, obs, dones = carry
                o = jnp.clip(
                    (obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10, 10
                )
                mean, _ls, _v = net.apply(params, o)
                tr = jax.vmap(_env.step)(s, mean)
                return (tr.state, tr.obs, dones + tr.done.sum()), ()

            (s, obs, dones), _ = jax.lax.scan(
                body, (s, obs, jnp.zeros((), jnp.float32)), None, length=T
            )
            return s, obs, dones

        obs = jax.jit(jax.vmap(env.obs_fn))(s)
        beat()
        s, obs, dones = rollout(s, obs)
        jax.block_until_ready(s.q)
        emit(phase="policy_gate", iters=iters, batch=B, steps=T,
             speed=round(float(jnp.linalg.norm(
                 s.qd[:, 0:2], axis=1).mean()), 3),
             z_mean=round(float(s.q[:, 2].mean()), 3),
             done_rate_per_step=round(float(dones) / (B * T), 5),
             finite=bool(jnp.all(jnp.isfinite(s.q))))


def main():
    emit(phase="session_start", deadline_in_s=round(DEADLINE - time.time()))
    guarded("walker_matrix", walker_matrix)
    guarded("stepper_spot", stepper_spot)
    guarded("kernel_oracle", kernel_oracle_gate)
    guarded("policy_gate", policy_gate)
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
