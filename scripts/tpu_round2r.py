"""Round-2r TPU session: steady-state family benches + terrain hot-path row.

Two things changed since the last hardware numbers (BENCH.md round-2i
table):

  1. bench.py now scans T=600 steps per dispatch (round-2p measured
     ~30 ms/execute axon dispatch overhead — at T=50 that was ~45% of
     the timed region). Every family row needs re-measuring at the
     steady-state methodology so BENCH.md is internally consistent.
  2. Commit 3fefea3 moved Walker3DTerrainEnv to ONE shared P×P patch
     extraction per control step (narrowphase + fall test + obs probes
     all read the same window). The terrain row is the one expected to
     move beyond the methodology change.

Phases (each time-guarded so a driver cutoff still leaves a valid file):
  A. walker b4096 (the driver headline config) + b16384
  B. every other family at b4096, terrain first
  C. terrain sanity: finite rollout + z tracks the heightfield

Appends JSON lines to scripts/tpu_round2r_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2r_results.jsonl"
T0 = time.time()
BUDGET_S = 40 * 60  # leave headroom before the driver's round cutoff


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod


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
    best = min(times)
    rate = B * T / best
    finite = bool(jnp.all(jnp.isfinite(state.q)))
    emit(phase="bench", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(rate),
         all_round_s=[round(x, 4) for x in times],
         compile_s=round(compile_s, 1), finite=finite,
         suspect=bool(rate > 5e7),
         z_mean=round(float(state.q[:, 2].mean()), 3))
    return rate


def guarded(fn, *a, **kw):
    if time.time() - T0 > BUDGET_S:
        emit(phase="skipped", tag=kw.get("tag", ""), reason="budget")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=kw.get("tag", ""), ok=False,
             error=traceback.format_exc()[-300:])
        return None


# ---------------- A: driver headline config
guarded(bench_env, mocca_envs_tpu.make("Walker3DCustomEnv-v0"), B=4096,
        tag="walker_b4096_T600")
guarded(bench_env, mocca_envs_tpu.make("Walker3DCustomEnv-v0"), B=16384,
        tag="walker_b16384_T600")

# ---------------- B: families, terrain first (the changed hot path)
for env_id, tag in (
    ("Walker3DTerrainEnv-v0", "terrain_b4096_T600"),
    ("Walker3DStepperEnv-v0", "stepper_b4096_T600"),
    ("CassieEnv-v0", "cassie_b4096_T600"),
    ("Monkey3DStepperEnv-v0", "monkey_b4096_T600"),
    ("Walker3DPDCustomEnv-v0", "pdwalker_b4096_T600"),
    ("Walker2DCustomEnv-v0", "walker2d_b4096_T600"),
    ("Crab2DCustomEnv-v0", "crab2d_b4096_T600"),
    ("Cassie2DEnv-v0", "cassie2d_b4096_T600"),
    ("CassiePhaseEnv-v0", "cassiephase_b4096_T600"),
    ("Child3DCustomEnv-v0", "child3d_b4096_T600"),
    ("CassiePhase2DEnv-v0", "cassiephase2d_b4096_T600"),
):
    try:
        env = mocca_envs_tpu.make(env_id)
    except Exception:
        emit(phase="bench", tag=tag, ok=False, error="make failed")
        continue
    guarded(bench_env, env, B=4096, tag=tag)

# ---------------- C: terrain semantic sanity after the patch rewrite
def terrain_sanity():
    from mocca_envs_tpu.terrain import scene as scene_mod

    env = mocca_envs_tpu.make("Walker3DTerrainEnv-v0")
    B = 1024
    keys = rng_mod.env_keys(rng_mod.root_key(7), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @jax.jit
    def roll(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), tr.done

        (state, key), dones = jax.lax.scan(body, (state, key), None, length=200)
        return state, dones

    state, dones = roll(state, jax.random.key(3))
    ground = jax.vmap(lambda s, q: scene_mod.hf_sample(s, q[:2]))(
        state.scene, state.q)
    height = state.q[:, 2] - ground
    emit(phase="terrain_sanity",
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         done_rate=round(float(dones.mean()), 4),
         height_above_ground_mean=round(float(height.mean()), 3),
         height_above_ground_p95=round(float(jnp.percentile(height, 95)), 3))


guarded(terrain_sanity)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
