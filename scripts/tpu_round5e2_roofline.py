"""Round-5e2: finish the roofline sweep — only arms MISSING a bench row
in scripts/tpu_round5e_results.jsonl are run (the in-queue 5e attempts
lost time to watchdog kills during their long first compiles).

Fixes over 5e: the equivalence batch is max(1024, tile) — 5e compared
at B=1024, where tiles >1024 cannot engage the fused kernel and the
check silently passed on the XLA-vs-XLA fallback (t1024's gate, which
DID exercise the kernel arithmetic shared by every tile, passed at
median 3.1e-3).

JSONL -> scripts/tpu_round5e_results.jsonl (same file; summarizer
merges).
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
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 0.5 * 3600))

FAILED = []


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    kw["probe"] = "5e2"
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


def have_bench():
    done = set()
    try:
        for line in open(OUT):
            r = json.loads(line)
            if r.get("phase") == "bench" and "env_steps_per_s" in r:
                done.add(r.get("tag"))
    except FileNotFoundError:
        pass
    return done


def build(tag, tile, dimsem, use_pallas=True):
    os.environ["MOCCA_TILE"] = str(tile)
    if dimsem:
        os.environ["MOCCA_DIMSEM"] = dimsem
    else:
        os.environ.pop("MOCCA_DIMSEM", None)
    return make_walker3d_custom(
        config=EngineConfig(use_pallas=use_pallas), name=f"R5e2{tag}"
    )


def equivalence(env_k, tag, tile):
    Beq = max(1024, tile)
    env_o = build(f"{tag}o", 1024, None, use_pallas=False)
    keys = rng_mod.env_keys(rng_mod.root_key(3), Beq)
    sk = jax.jit(jax.vmap(env_k.init))(keys)
    so = jax.jit(jax.vmap(env_o.init))(keys)
    a = jax.random.uniform(
        jax.random.key(7), (Beq, env_k.act_dim), minval=-1.0, maxval=1.0
    )
    qk = jax.jit(jax.vmap(env_k.step))(sk, a).state.q
    qo = jax.jit(jax.vmap(env_o.step))(so, a).state.q
    dq = np.abs(np.asarray(qk) - np.asarray(qo)).max(axis=1)
    med, p99 = float(np.median(dq)), float(np.percentile(dq, 99))
    ok = med < 2e-2 and p99 < 0.5
    emit(phase="equivalence", tag=tag, batch=Beq, median_dq=med,
         p99_dq=p99, ok=ok)
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
    ("t2048", 2048, None),
    ("t2048_par", 2048, "parallel"),
    ("t2048_arb", 2048, "arbitrary"),
    ("t4096", 4096, None),
    ("t4096_par", 4096, "parallel"),
    ("t1024", 1024, None),
]


def main():
    done = have_bench()
    emit(phase="session_start", deadline_in_s=round(time_left()),
         already_benched=sorted(done))
    eq_done = {1024: True}   # t1024 gated in 5e (median 3.1e-3, ok)
    for tag, tile, dimsem in ARMS:
        if tag in done:
            continue
        if time_left() < 150:
            emit(phase="arm_skipped", tag=tag, reason="deadline")
            continue
        beat()
        try:
            env = build(tag, tile, dimsem)
            # kernel arithmetic gate once per TILE at the real kernel
            # batch; dimsem variants share the per-tile program (the hint
            # only licenses grid-iteration reordering, and the grid axis
            # walks independent env tiles)
            if tile not in eq_done:
                eq_done[tile] = equivalence(env, tag, tile)
            if not eq_done[tile]:
                emit(phase="arm_rejected", tag=tag, reason="equivalence")
                continue
            bench(env, tag)
        except Exception:
            traceback.print_exc()
            FAILED.append(tag)
            emit(phase="arm_failed", tag=tag,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
