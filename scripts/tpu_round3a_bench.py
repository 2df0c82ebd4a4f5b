"""Round-3a TPU session: post-change perf + grounded + roofline rows.

Three engine-visible changes landed since the round-2r table:
  1. stone-culling fast path (EngineConfig.stone_window=8; stepper kernel
     compiles K=8 boxes instead of 20) — VERDICT r2 #6;
  2. per-row W build with structural-zero folding in the fused kernel
     (limit rows skip their leading-zero substitution + sweep terms) —
     VERDICT r2 #9 roofline chase;
  3. walker/child feet widened to 2×2 corner sphere sets (ns 10 → 14,
     nr 51 → 63) — VERDICT r2 #5 contact manifolds.
Net walker/stepper movement must be measured, not guessed.

Phases (each guarded; JSONL → scripts/tpu_round3a_results.jsonl):
  A. family benches b4096 T600 (+walker b16384) with z̄ per row;
  B. stepper stone_window sweep {0, 6, 8};
  C. walker tile sweep MOCCA_TILE {1024, 2048} (roofline datum);
  D. GROUNDED rows (VERDICT r2 #3): damped model variants (per-joint
     viscous damping 2.0 N·m·s — the reference-style knob models carry)
     for the torque families whose random-torque rows fly; z̄ recorded.
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

OUT = "scripts/tpu_round3a_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 50 * 60))


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
         z_mean=round(float(state.q[:, 2].mean()), 3))
    return rate


def guarded(fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase="skipped", tag=kw.get("tag", ""), reason="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=kw.get("tag", ""), ok=False,
             error=traceback.format_exc()[-300:])
        return None


# ---------------- A: all families at the new engine state
guarded(bench_env, mocca_envs_tpu.make("Walker3DCustomEnv-v0"), B=4096,
        tag="walker_b4096")
guarded(bench_env, mocca_envs_tpu.make("Walker3DCustomEnv-v0"), B=16384,
        tag="walker_b16384")
for env_id, tag in (
    ("Walker3DStepperEnv-v0", "stepper_b4096"),
    ("Walker3DTerrainEnv-v0", "terrain_b4096"),
    ("CassieEnv-v0", "cassie_b4096"),
    ("Monkey3DStepperEnv-v0", "monkey_b4096"),
    ("Walker3DPDCustomEnv-v0", "pdwalker_b4096"),
    ("Child3DCustomEnv-v0", "child3d_b4096"),
    ("Walker2DCustomEnv-v0", "walker2d_b4096"),
):
    guarded(bench_env, mocca_envs_tpu.make(env_id), tag=tag)

# ---------------- B: stone-window sweep on the stepper
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper
from mocca_envs_tpu.utils.config import EngineConfig

for win in (0, 6, 8):
    guarded(
        bench_env,
        make_walker3d_stepper(config=EngineConfig(stone_window=win),
                              name=f"StepperW{win}"),
        tag=f"stepper_window{win}",
    )

# ---------------- C: tile sweep (roofline datum for the walker)
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom

for tile in (2048,):   # 1024 is phase A's default row
    os.environ["MOCCA_TILE"] = str(tile)
    guarded(
        bench_env,
        make_walker3d_custom(name=f"WalkerT{tile}"),
        tag=f"walker_tile{tile}",
    )
os.environ.pop("MOCCA_TILE", None)

# ---------------- D: grounded damped-variant rows (z̄ must stay low)
from mocca_envs_tpu.models import child3d, walker3d

DAMP = 2.0


def damped(model):
    return model.replace(damping=jnp.full((model.nj,), DAMP, jnp.float32))


guarded(bench_env,
        make_walker3d_custom(model=damped(walker3d.make_model()),
                             name="WalkerDamped"),
        tag="walker_damped_b4096")
from mocca_envs_tpu.tasks.walker_custom import WalkerParams

guarded(bench_env,
        make_walker3d_custom(model=damped(child3d.make_model()),
                             name="Child3DDamped", initial_z=child3d.INITIAL_Z,
                             params=WalkerParams.default().replace(
                                 terminal_height=jnp.asarray(0.35, jnp.float32))),
        tag="child3d_damped_b4096")
guarded(bench_env,
        make_walker3d_stepper(model=damped(walker3d.make_model()),
                              name="StepperDamped"),
        tag="stepper_damped_b4096")

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
