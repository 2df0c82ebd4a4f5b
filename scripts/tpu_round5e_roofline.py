"""Round-5e TPU probe: walker roofline chase — tile x dimension_semantics
sweep (VERDICT r4 weak #7 / next-round #7).

Round 3 landed 0.340 ms/control-step at b4096 (MOCCA_TILE=2048) vs a
~0.25 ms VPU-arithmetic ceiling at nr=63 — a ~1.4x schedule gap. The
named untried lever is pipeline scheduling: this sweep measures the
grid's dimension_semantics hint ("parallel" is semantically true — the
grid axis walks independent env tiles) and larger tiles (4096 = one
grid step at b4096, which removes inter-step pipelining entirely and
isolates whether the bound is schedule or memory).

Every arm is equivalence-gated against the XLA oracle (one control
step, per-env MEDIAN |dq| vs the 4f2 baseline 3.65e-3; an arm that
speeds up by computing something else doesn't count).

Memory-roofline datum for the "profile-backed statement" fallback: the
kernel's HBM traffic per control step is just the state in/out
((nq+nv+nj+2) x B x 4 B x 2 ~= 1.3 MB at b4096) — at ~800 GB/s that is
~2 us against ~340 us measured, so if no schedule knob moves the
number, the bound is in-core (VPU issue/dependency chains), not the
memory system; the JSONL records both sides of that arithmetic.

Bar: >=14 M env-steps/s b4096 at shipped iters=4, or the statement.
JSONL -> scripts/tpu_round5e_results.jsonl.
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

OUT = "scripts/tpu_round5e_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 0.33 * 3600))

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


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom
from mocca_envs_tpu.utils.config import EngineConfig

B = 4096
T = 600


def build(tag, tile, dimsem, use_pallas=True):
    os.environ["MOCCA_TILE"] = str(tile)
    if dimsem:
        os.environ["MOCCA_DIMSEM"] = dimsem
    else:
        os.environ.pop("MOCCA_DIMSEM", None)
    return make_walker3d_custom(
        config=EngineConfig(use_pallas=use_pallas), name=f"R5e{tag}"
    )


def equivalence(env_k, tag):
    """One-control-step kernel-vs-oracle gate (4f2 methodology)."""
    env_o = build(f"{tag}oracle", 1024, None, use_pallas=False)
    keys = rng_mod.env_keys(rng_mod.root_key(3), 1024)
    sk = jax.jit(jax.vmap(env_k.init))(keys)
    so = jax.jit(jax.vmap(env_o.init))(keys)
    a = jax.random.uniform(
        jax.random.key(7), (1024, env_k.act_dim), minval=-1.0, maxval=1.0
    )
    qk = jax.jit(jax.vmap(env_k.step))(sk, a).state.q
    qo = jax.jit(jax.vmap(env_o.step))(so, a).state.q
    dq = np.abs(np.asarray(qk) - np.asarray(qo)).max(axis=1)
    med, p99 = float(np.median(dq)), float(np.percentile(dq, 99))
    ok = med < 2e-2 and p99 < 0.5   # 4f2 hardware baselines: 3.65e-3 / 6.2e-2
    emit(phase="equivalence", tag=tag, median_dq=med, p99_dq=p99, ok=ok)
    return ok


def bench(env, tag, rounds=3):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(
                ka, (B, env.act_dim), minval=-1.0, maxval=1.0
            )
            tr = jax.vmap(env.step)(s, a)
            return (tr.state, k), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    key = jax.random.key(1)
    tC = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - tC
    beat()
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        times.append(time.perf_counter() - t0)
    best = min(times)
    emit(phase="bench", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(B * T / best),
         ms_per_control_step=round(1e3 * best / T, 4),
         all_round_s=[round(x, 4) for x in times],
         compile_s=round(compile_s, 1),
         finite=bool(jnp.all(jnp.isfinite(state.q))))
    return B * T / best


ARMS = [
    ("t1024", 1024, None),
    ("t2048", 2048, None),
    ("t2048_par", 2048, "parallel"),
    ("t2048_arb", 2048, "arbitrary"),
    ("t4096", 4096, None),
    ("t4096_par", 4096, "parallel"),
]


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    # memory-roofline datum (see module docstring); dims from the model
    from mocca_envs_tpu.models import walker3d
    m = walker3d.make_model()
    nq, nv, nj = 7 + m.nj, 6 + m.nj, m.nj
    bytes_per_step = (nq + nv + nj + 2) * B * 4 * 2
    emit(phase="mem_roofline", hbm_bytes_per_control_step=bytes_per_step,
         at_800gbps_us=round(bytes_per_step / 800e9 * 1e6, 2))
    best = (None, 0.0)
    for tag, tile, dimsem in ARMS:
        if time_left() < 150:
            emit(phase="arm_skipped", tag=tag, reason="deadline")
            continue
        beat()
        try:
            env = build(tag, tile, dimsem)
            if not equivalence(env, tag):
                emit(phase="arm_rejected", tag=tag, reason="equivalence")
                continue
            rate = bench(env, tag)
            if rate > best[1]:
                best = (tag, rate)
        except Exception:
            traceback.print_exc()
            FAILED.append(tag)
            emit(phase="arm_failed", tag=tag,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         best_tag=best[0], best_env_steps_per_s=round(best[1]),
         wall_s=round(time.time() - T0, 1))


main()
