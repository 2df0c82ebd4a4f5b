"""Round-2i TPU session: solver-option matrix for the round's engine work.

Two new EngineConfig options landed on CPU gates this round and need the
hardware A/B before any default flip:

- ``matfree_pgs``: never materialize A = WᵀW in the fused kernel (saves
  nv·nr² tile-FMAs — walker ~97k, more than all sweeps combined — and
  ~14 MB VMEM; sweeps run on z = W·λ carries at 2nv ops/row).
- ``warm_start``: carry λ across substeps (static row layout keeps row
  meaning), converging in ~half the sweeps (contact gates green at 4).

Phases:
  A. Walker b4096 matrix: default(block@8) · mf@8 · w@4 · w@6 ·
     mf+w@4 · mf+w@6, with a finite/plausibility check per cell.
  B. Best config -> full family sweep (walker b4096/b16384, PD walker,
     stepper, terrain, cassie, monkey) vs shipped defaults.
  C. Batch sweep at the best config (2048/4096/8192/16384).

Appends JSON lines to scripts/tpu_round2i_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2i_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.tasks.cassie_task import CASSIE_CONFIG
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
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        best = min(best, time.perf_counter() - t0)
    finite = bool(jnp.all(jnp.isfinite(state.q)))
    z_mean = float(state.q[:, 2].mean())
    emit(
        phase="bench", tag=tag, batch=B,
        env_steps_per_s=round(B * T / best),
        compile_s=round(compile_s, 1), finite=finite, z_mean=round(z_mean, 3),
    )
    return B * T / best


# ---------------- A: walker option matrix
MATRIX = [
    ("default_block8", EngineConfig()),
    ("mf8", EngineConfig(matfree_pgs=True)),
    ("w4", EngineConfig(warm_start=True, solver_iters=4)),
    ("w6", EngineConfig(warm_start=True, solver_iters=6)),
    ("mf_w4", EngineConfig(matfree_pgs=True, warm_start=True, solver_iters=4)),
    ("mf_w6", EngineConfig(matfree_pgs=True, warm_start=True, solver_iters=6)),
    # reuse_factor lost 5-8% in round 2e from VMEM pressure — matfree frees
    # ~14 MB, so retest the combination
    ("mf_w4_rf", EngineConfig(matfree_pgs=True, warm_start=True,
                              solver_iters=4, reuse_factor=True)),
]
results = {}
for tag, cfg in MATRIX:
    try:
        env = mocca_envs_tpu.make("Walker3DCustomEnv-v0", config=cfg)
        results[tag] = bench_env(env, tag=f"walker_{tag}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"walker_{tag}", ok=False,
             error=traceback.format_exc()[-300:])

best_tag = max(results, key=results.get) if results else "default_block8"
emit(phase="matrix_best", tag=best_tag,
     speedup_vs_default=round(results.get(best_tag, 0.0)
                              / max(results.get("default_block8", 1.0), 1.0), 3))

BEST = dict(MATRIX)[best_tag]
BEST_KW = dict(
    matfree_pgs=BEST.matfree_pgs, warm_start=BEST.warm_start,
    solver_iters=BEST.solver_iters, reuse_factor=BEST.reuse_factor,
)

# ---------------- B: family sweep at the best config
import dataclasses

FAMS = [
    ("Walker3DCustomEnv-v0", 4096),
    ("Walker3DCustomEnv-v0", 16384),
    ("Walker3DPDCustomEnv-v0", 4096),
    ("Walker3DStepperEnv-v0", 4096),
    ("Walker3DTerrainEnv-v0", 4096),
    ("CassieEnv-v0", 4096),
    ("Monkey3DStepperEnv-v0", 4096),
]

for env_id, B in FAMS:
    try:
        base_cfg = CASSIE_CONFIG if env_id == "CassieEnv-v0" else EngineConfig()
        cfg = dataclasses.replace(base_cfg, **BEST_KW)
        env = mocca_envs_tpu.make(env_id, config=cfg)
        bench_env(env, B=B, tag=f"{env_id.removesuffix('-v0')}_{best_tag}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"{env_id}_{best_tag}", ok=False,
             error=traceback.format_exc()[-300:])

# ---------------- C2: terrain cost decomposition (where do the 0.33 µs go?)
# Times each terrain-only component standalone at B=4096: the per-control-
# step local-patch extraction einsum (HIGHEST vs default precision vs a
# two-pass bf16 hi/lo split — ~2^-16 relative error, micrometers on heights
# vs the 2 mm contact slop), and the 9-point obs-probe/termination sampling.
try:
    B = 4096
    G, P = 65, 16
    key = jax.random.key(0)
    hf = 0.25 * jax.random.normal(key, (B, G, G), dtype=jnp.float32)
    si = jax.random.randint(jax.random.key(1), (B,), 0, G - P)
    sj = jax.random.randint(jax.random.key(2), (B,), 0, G - P)

    def extract(hf, si, sj, precision):
        rows = (si[:, None, None] + jnp.arange(P)[None, :, None]
                == jnp.arange(G)[None, None, :]).astype(jnp.float32)
        cols = (sj[:, None, None] + jnp.arange(P)[None, :, None]
                == jnp.arange(G)[None, None, :]).astype(jnp.float32)
        return jnp.einsum("bph,bhw,bqw->bpq", rows, hf, cols,
                          precision=precision)

    def extract_split(hf, si, sj):
        rows = (si[:, None, None] + jnp.arange(P)[None, :, None]
                == jnp.arange(G)[None, None, :]).astype(jnp.bfloat16)
        cols = (sj[:, None, None] + jnp.arange(P)[None, :, None]
                == jnp.arange(G)[None, None, :]).astype(jnp.bfloat16)
        hi = hf.astype(jnp.bfloat16)
        lo = (hf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = 0.0
        for part in (hi, lo):
            t = jax.lax.dot_general(
                rows, part, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out = out + jax.lax.dot_general(
                t, cols, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        return out

    variants = {
        "extract_highest": jax.jit(lambda h, a, b: extract(h, a, b, jax.lax.Precision.HIGHEST)),
        "extract_default": jax.jit(lambda h, a, b: extract(h, a, b, jax.lax.Precision.DEFAULT)),
        "extract_bf16split": jax.jit(extract_split),
    }
    ref = None
    for tag, fn in variants.items():
        out = fn(hf, si, sj)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(hf, si, sj)
        jax.block_until_ready(out)
        dt_us = (time.perf_counter() - t0) / 50 * 1e6
        if ref is None:
            ref = out
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        emit(phase="terrain_decomp", tag=tag, us_per_call=round(dt_us, 1),
             us_per_env=round(dt_us / B, 4), max_err_vs_highest=err)

    # probe sampling (hf_sample_onehot, 9 points per env)
    from mocca_envs_tpu.terrain.scene import Scene, hf_sample_onehot

    sc = Scene(has_ground=True, has_hf=True, ground_z=jnp.zeros(()),
               hf_height=hf[0], hf_xy0=jnp.asarray([-10.0, -10.0]),
               hf_cell=jnp.asarray(20.0 / 64), friction=jnp.asarray(0.8))
    scb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), sc)
    pts = jax.random.uniform(jax.random.key(3), (B, 9, 2), minval=-8, maxval=8)
    samp = jax.jit(jax.vmap(hf_sample_onehot))
    out = samp(scb, pts); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = samp(scb, pts)
    jax.block_until_ready(out)
    dt_us = (time.perf_counter() - t0) / 50 * 1e6
    emit(phase="terrain_decomp", tag="probes9", us_per_call=round(dt_us, 1),
         us_per_env=round(dt_us / B, 4))
except Exception:
    traceback.print_exc()
    emit(phase="terrain_decomp", ok=False, error=traceback.format_exc()[-300:])

# ---------------- C: batch sweep at best config
for B in (2048, 8192):
    try:
        env = mocca_envs_tpu.make("Walker3DCustomEnv-v0", config=EngineConfig(**BEST_KW))
        bench_env(env, B=B, tag=f"walker_{best_tag}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"walker_b{B}", ok=False)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2I SESSION DONE in {time.time()-T0:.0f}s", flush=True)
