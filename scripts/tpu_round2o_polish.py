"""Round-2o TPU session: bench polish after the 2n validation run.

  A. Walker b4096 tile sweep (2n swept tiles at b8192 only — flat; the
     DRIVER's bench.py runs b4096 where launch/pipeline overhead is the
     bottleneck, so the tile choice may matter exactly there).
  B. Stepper b4096 bench redo: 2n's row printed an impossible 1.4e9
     env-steps/s (timed rounds ~0.1 ms after a 178 s compile — some axon
     dispatch anomaly); re-measure twice with a sanity ceiling.
  C. Kernel-vs-oracle hardware stats with per-env percentiles (2n asserted
     on the max over 1024 contact-rich envs, which a single contact-margin
     flip dominates).

Appends JSON lines to scripts/tpu_round2o_results.jsonl.
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

OUT = "scripts/tpu_round2o_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.utils.config import EngineConfig


def bench_env(env, B=4096, T=50, rounds=3, tag=""):
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
    best = min(times)
    rate = B * T / best
    finite = bool(jnp.all(jnp.isfinite(state.q)))
    # sanity ceiling: >50M env-steps/s for a full physics step is a timing
    # artifact, not a measurement (2n saw 1.4e9 once)
    emit(phase="bench", tag=tag, batch=B, env_steps_per_s=round(rate),
         all_round_s=[round(x, 4) for x in times],
         compile_s=round(compile_s, 1), finite=finite,
         suspect=bool(rate > 5e7),
         z_mean=round(float(state.q[:, 2].mean()), 3))
    return rate


# ---------------- A: walker b4096 tile sweep
for tile in (1024, 2048, 4096):
    try:
        os.environ["MOCCA_TILE"] = str(tile)
        bench_env(mocca_envs_tpu.make("Walker3DCustomEnv-v0"), B=4096,
                  tag=f"walker_b4096_tile{tile}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"walker_b4096_tile{tile}", ok=False,
             error=traceback.format_exc()[-300:])
os.environ["MOCCA_TILE"] = "1024"

# ---------------- B: stepper bench redo
for attempt in (1, 2):
    try:
        bench_env(mocca_envs_tpu.make("Walker3DStepperEnv-v0"), B=4096,
                  tag=f"stepper_redo{attempt}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"stepper_redo{attempt}", ok=False,
             error=traceback.format_exc()[-300:])

# ---------------- C: kernel vs oracle, per-env percentiles
try:
    B = 1024
    env_k = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    env_o = mocca_envs_tpu.make(
        "Walker3DCustomEnv-v0", config=EngineConfig(use_pallas=False))
    keys = rng_mod.env_keys(rng_mod.root_key(7), B)
    s_k = jax.jit(jax.vmap(env_k.init))(keys)
    s_o = jax.jit(jax.vmap(env_o.init))(keys)
    a = jax.random.uniform(jax.random.key(9), (B, env_k.act_dim),
                           minval=-1.0, maxval=1.0)
    tr_k = jax.jit(jax.vmap(env_k.step))(s_k, a)
    tr_o = jax.jit(jax.vmap(env_o.step))(s_o, a)
    dq_env = jnp.max(jnp.abs(tr_k.state.q - tr_o.state.q), axis=1)
    dr_env = jnp.abs(tr_k.reward - tr_o.reward)
    emit(phase="kernel_vs_oracle",
         med_dq=float(jnp.median(dq_env)),
         p90_dq=float(jnp.percentile(dq_env, 90)),
         p99_dq=float(jnp.percentile(dq_env, 99)),
         max_dq=float(dq_env.max()),
         med_dr=float(jnp.median(dr_env)),
         max_dr=float(dr_env.max()),
         frac_dq_gt_1mm=float((dq_env > 1e-3).mean()),
         ok=bool(float(jnp.median(dq_env)) < 1e-3))
except Exception:
    traceback.print_exc()
    emit(phase="kernel_vs_oracle", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2O SESSION DONE in {time.time()-T0:.0f}s", flush=True)
