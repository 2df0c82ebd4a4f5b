"""Round-2p TPU session: decompose the b4096 fixed cost F ~= 570us.

The 2n batch-scaling fit (BENCH.md) put per-control-step wall time at
F + c*tiles with F ~= 570us -- 64% of the b4096 step, and the reason the
driver headline (bench.py, B=4096, T=50) reads half the b16384 rate.
This session finds where F lives:

  A. T-sweep at b4096: per-step time for T=50/200/800 scan lengths, one
     execute each. If per-step time falls with T, part of "F" is
     per-EXECUTE dispatch (axon RPC + host sync + donation), not per-step
     device time -- bench.py's T=50 then UNDER-reports steady state.
     Fits time_per_exec = E + T*s and reports both.
  B. Level decomposition at T=200, b4096 and b16384:
       control-only (fused kernel + custom_vmap dispatch)
       raw_step     (+ obs/reward/termination/target-resample glue)
       full step    (+ auto-reset: fresh reset + tree select + fresh obs)
     Differences attribute F between kernel, task glue, and auto-reset.
  C. Terrain patch-extraction reformulations (microbench, B=4096, the
     ~0.21us/env that is ~the whole terrain-vs-flat gap):
       v0 shipped one-hot einsum, Precision.HIGHEST
       v1 same, default precision
       v2 bf16 one-hots + bf16 grid, f32 accumulate
       v3 single big matmul against the shared 16-grid bank
          (shifted-concat trick: rows of bank[idx] starting at si are
          contiguous rows of the flattened (16*G, G) bank, so the row
          stage is ONE (B,1040)@(1040,P*G) matmul instead of B small ones)
     plus max-abs error vs v0 on the same inputs.

Appends JSON lines to scripts/tpu_round2p_results.jsonl.
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

SMOKE = os.environ.get("MOCCA_2P_SMOKE") == "1"   # CPU shape/logic check
if not SMOKE:
    assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2p_results.jsonl" if not SMOKE else "/tmp/tpu_round2p_smoke.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod

B = 4096 if not SMOKE else 8
ROUNDS = 3 if not SMOKE else 1
TSWEEP = (50, 200, 800) if not SMOKE else (2, 4, 8)
LEVEL_BATCHES = (4096, 16384) if not SMOKE else (8,)
LEVEL_T = 200 if not SMOKE else 3


def time_rollout(rollout, state, key, n_steps, rounds=ROUNDS):
    """Best-of-rounds wall time for one jitted scan execute."""
    state, key = rollout(state, key)          # compile + warm
    jax.block_until_ready(jax.tree.leaves(state)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        best = min(best, time.perf_counter() - t0)
    return best, state


# ---------------------------------------------------------------- phase A
try:
    env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state0 = jax.jit(jax.vmap(env.init))(keys)

    def make_rollout(T):
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

        return rollout

    pts = []
    state = state0
    for T in TSWEEP:
        best, state = time_rollout(make_rollout(T), state, jax.random.key(1), T)
        us = best / T * 1e6
        pts.append((T, best))
        emit(phase="tsweep", T=T, us_per_step=round(us, 1),
             env_steps_per_s=round(B * T / best))
    # least-squares fit: exec_time = E + s*T
    Ts = np.array([p[0] for p in pts], dtype=np.float64)
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    A = np.stack([np.ones_like(Ts), Ts], axis=1)
    (E, s), *_ = np.linalg.lstsq(A, ys, rcond=None)
    emit(phase="tsweep_fit", per_exec_overhead_ms=round(E * 1e3, 2),
         steady_us_per_step=round(s * 1e6, 1),
         steady_env_steps_per_s=round(B / s))
except Exception:
    traceback.print_exc()
    emit(phase="tsweep", ok=False, error=traceback.format_exc()[-300:])


# ---------------------------------------------------------------- phase B
def bench_levels(BB):
    from mocca_envs_tpu.models import walker3d
    from mocca_envs_tpu.ops.step import make_control_step
    from mocca_envs_tpu.terrain import scene as scene_mod
    from mocca_envs_tpu.utils.config import EngineConfig

    T = LEVEL_T
    model = walker3d.make_model()
    cfg = EngineConfig()

    def actuation(q, qd, a):
        return model.power_coef * model.actuated * jnp.clip(a, -1.0, 1.0)

    control = make_control_step(model, cfg, actuation=actuation)
    scene1 = scene_mod.flat()
    sceneB = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (BB,) + jnp.shape(jnp.asarray(x))),
        scene1,
    )

    env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    keys = rng_mod.env_keys(rng_mod.root_key(0), BB)
    init = jax.jit(jax.vmap(env.init))
    fresh = lambda: init(keys)   # donation eats each level's input buffers

    # L0: physics control step only (kernel + custom_vmap dispatch)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def roll_ctrl(carry, key):
        def body(c, _):
            q, qd, key = c
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (BB, env.act_dim), minval=-1.0, maxval=1.0)
            q, qd, _info = jax.vmap(control, in_axes=(0, 0, 0, 0))(q, qd, a, sceneB)
            return (q, qd, key), ()

        (q, qd, key), _ = jax.lax.scan(body, (*carry, key), None, length=T)
        return (q, qd), key

    # L1: raw_step (physics + obs + reward + termination, NO auto-reset)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def roll_raw(state, key):
        def body(c, _):
            state, key = c
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (BB, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step_no_reset)(state, a)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    # L2: full step (auto-reset select + fresh reset + fresh obs)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def roll_full(state, key):
        def body(c, _):
            state, key = c
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (BB, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    s = fresh()
    best, _ = time_rollout(roll_ctrl, (s.q, s.qd), jax.random.key(2), T)
    emit(phase="levels", batch=BB, level="control_only",
         us_per_step=round(best / T * 1e6, 1))
    best, endst = time_rollout(roll_raw, fresh(), jax.random.key(3), T)
    emit(phase="levels", batch=BB, level="raw_step",
         us_per_step=round(best / T * 1e6, 1),
         finite_frac=round(float(jnp.mean(jnp.all(
             jnp.isfinite(endst.q), axis=-1).astype(jnp.float32))), 4))
    best, _ = time_rollout(roll_full, fresh(), jax.random.key(4), T)
    emit(phase="levels", batch=BB, level="full_step",
         us_per_step=round(best / T * 1e6, 1),
         env_steps_per_s=round(BB * T / best))


for BB in LEVEL_BATCHES:
    try:
        bench_levels(BB)
    except Exception:
        traceback.print_exc()
        emit(phase="levels", batch=BB, ok=False,
             error=traceback.format_exc()[-300:])


# ---------------------------------------------------------------- phase C
try:
    from mocca_envs_tpu.terrain.heightfield import fractal_heightfield

    P, G, NB = 16, 65, 16
    CALLS = 100 if not SMOKE else 3
    bank = np.stack(
        [fractal_heightfield(G, amplitude=0.25, seed=i) for i in range(NB)]
    ).astype(np.float32)
    bank_j = jnp.asarray(bank)
    bankflat = bank_j.reshape(NB * G, G)                       # (1040, 65)
    # shifted-concat: BF[:, p*G:(p+1)*G] = bankflat rolled up by p rows, so
    # onehot(idx*G+si) @ BF yields rows si..si+P-1 of bank[idx] side by side
    BF = jnp.concatenate(
        [jnp.roll(bankflat, -p, axis=0) for p in range(P)], axis=1
    )                                                          # (1040, P*G)

    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, NB, size=B), dtype=jnp.int32)
    si0 = jnp.asarray(rs.randint(0, G - P, size=B), dtype=jnp.int32)
    sj0 = jnp.asarray(rs.randint(0, G - P, size=B), dtype=jnp.int32)
    hfB = bank_j[idx]                                          # (B, G, G)

    def onehot(starts, n, span, dtype=jnp.float32):
        return (
            (starts[:, None, None] + jnp.arange(span)[None, :, None])
            == jnp.arange(n)[None, None, :]
        ).astype(dtype)                                        # (B, span, n)

    def v0(si, sj):
        rows = onehot(si, G, P)
        cols = onehot(sj, G, P)
        return jnp.einsum("bph,bhw,bqw->bpq", rows, hfB, cols,
                          precision=jax.lax.Precision.HIGHEST)

    def v1(si, sj):
        rows = onehot(si, G, P)
        cols = onehot(sj, G, P)
        return jnp.einsum("bph,bhw,bqw->bpq", rows, hfB, cols)

    def v2(si, sj):
        rows = onehot(si, G, P, jnp.bfloat16)
        cols = onehot(sj, G, P, jnp.bfloat16)
        return jnp.einsum("bph,bhw,bqw->bpq", rows,
                          hfB.astype(jnp.bfloat16), cols,
                          preferred_element_type=jnp.float32)

    def v3(si, sj):
        start = (idx * G + si)                                 # (B,)
        S = (start[:, None] == jnp.arange(NB * G)[None, :]).astype(jnp.float32)
        rows_patch = (S @ BF).reshape(B, P, G)                 # one big matmul
        cols = onehot(sj, G, P)
        return jnp.einsum("bpw,bqw->bpq", rows_patch, cols)

    ref = jax.jit(v0)(si0, sj0)
    for tag, fn in (("v0_highest", v0), ("v1_default", v1),
                    ("v2_bf16", v2), ("v3_bankmatmul", v3)):
        def scanner(si, sj, fn=fn):
            def body(acc, k):
                si_k = (si + k) % (G - P)
                sj_k = (sj + k) % (G - P)
                return acc + fn(si_k, sj_k).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(
                body, jnp.zeros((B, P, P), jnp.float32),
                jnp.arange(CALLS, dtype=jnp.int32))
            return acc

        jfn = jax.jit(scanner)
        acc = jfn(si0, sj0)
        jax.block_until_ready(acc)
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            acc = jfn(si0, sj0)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        err = float(jnp.max(jnp.abs(jax.jit(fn)(si0, sj0).astype(jnp.float32) - ref)))
        emit(phase="extract", tag=tag,
             us_per_env_call=round(best / CALLS / B * 1e6, 4),
             batch_us_per_call=round(best / CALLS * 1e6, 1),
             max_abs_err_m=round(err, 6))
except Exception:
    traceback.print_exc()
    emit(phase="extract", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
