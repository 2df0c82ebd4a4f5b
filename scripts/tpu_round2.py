"""Round-2 on-TPU validation — ONE claim, every phase guarded.

Phases (each independent; failures don't lose the rest):
  1. hf-kernel: Walker3DTerrainEnv fused-kernel vs JAX oracle (distributional
     gate — bilinear cell borders have discontinuous normals, so a handful of
     envs may flip contact frames on 1-ulp differences; bulk agreement is the
     correctness signal) + 20-step rollout health.
  2. raycast: Mosaic lowering probe result + kernel vs oracle numerics + rate.
  3. monkey-bars: Monkey3DStepperEnv batched steps through the fused kernel
     (bar-capsule narrowphase lowering) + finite check + throughput.
  4. throughput: walker3d / cassie regression rows + terrain + monkey.

Appends one JSON line per result to scripts/tpu_round2_results.jsonl.
Run:  python scripts/tpu_round2.py
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.core import rng as rng_mod

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2_results.jsonl"


def emit(**kw):
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def guarded(name):
    def deco(fn):
        def run():
            try:
                fn()
            except Exception:
                traceback.print_exc()
                emit(phase=name, ok=False, error=traceback.format_exc()[-400:])
        return run

    return deco


def throughput(env, B=4096, T=50, rounds=3):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def timed(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(st, a)
            return (tr.state, k), ()

        (st, k), _ = jax.lax.scan(body, (state, key), None, length=T)
        return st, k

    st, k = timed(state, jax.random.key(1))
    jax.block_until_ready(st.q)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        st, k = timed(st, k)
        jax.block_until_ready(st.q)
        best = min(best, time.perf_counter() - t0)
    return B * T / best, st


@guarded("hf_kernel")
def phase_hf():
    from mocca_envs_tpu.tasks.walker_terrain import make_walker3d_terrain
    from mocca_envs_tpu.utils.config import EngineConfig

    B = 4096
    env = make_walker3d_terrain()
    env_o = make_walker3d_terrain(config=EngineConfig(use_pallas=False))
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)
    jax.block_until_ready(state.q)
    acts = jax.random.uniform(jax.random.key(2), (B, env.act_dim), minval=-1, maxval=1)
    tr_k = jax.jit(jax.vmap(env.step))(state, acts)
    jax.block_until_ready(tr_k.state.q)
    tr_o = jax.jit(jax.vmap(env_o.step))(state, acts)
    jax.block_until_ready(tr_o.state.q)
    qk, qo = np.asarray(tr_k.state.q), np.asarray(tr_o.state.q)
    dk, do = np.asarray(tr_k.state.qd), np.asarray(tr_o.state.qd)
    rk, ro = np.asarray(tr_k.reward), np.asarray(tr_o.reward)
    qe = np.abs(qk - qo).max(axis=1)
    de = np.abs(dk - do).max(axis=1)
    frac_q = float(np.mean(qe < 1e-3))
    frac_d = float(np.mean(de < 1e-2))
    done_agree = float(np.mean(np.asarray(tr_k.done) == np.asarray(tr_o.done)))
    emit(
        phase="hf_kernel", ok=bool(frac_q > 0.97 and done_agree > 0.99),
        q_med=float(np.median(qe)), q_p99=float(np.quantile(qe, 0.99)),
        q_max=float(qe.max()), frac_q_lt_1e3=frac_q,
        qd_med=float(np.median(de)), frac_qd_lt_1e2=frac_d,
        rew_med=float(np.median(np.abs(rk - ro))), rew_max=float(np.abs(rk - ro).max()),
        done_agree=done_agree,
    )

    # rollout health: 20 steps, count blowups
    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(st, a)
            return (tr.state, k), tr.state.blowup_count.sum()

        (st, k), blow = jax.lax.scan(body, (state, key), None, length=20)
        return st, blow[-1]

    st, blow = rollout(state, jax.random.key(3))
    jax.block_until_ready(st.q)
    emit(phase="hf_rollout", ok=bool(float(blow) == 0.0), blowups=float(blow))


@guarded("raycast")
def phase_raycast():
    from mocca_envs_tpu.ops.pallas.raycast import (
        TILE, make_raycaster, raycast_reference,
    )

    H = W = 65
    rc = make_raycaster((H, W))
    lowered = rc.__name__ == "raycast"  # 'reference' means fallback
    B = 4096
    key = jax.random.key(11)
    hf = 0.25 * jax.random.normal(key, (H, W))
    hf = (hf + jnp.roll(hf, 1, 0) + jnp.roll(hf, 1, 1)) / 3.0
    xy0 = jnp.asarray([-4.8, -4.8])
    cell = jnp.asarray(0.15)
    ks = jax.random.split(key, 3)
    org = jnp.stack(
        [
            jax.random.uniform(ks[0], (B,), minval=-3.0, maxval=3.0),
            jax.random.uniform(ks[1], (B,), minval=-3.0, maxval=3.0),
            jnp.full((B,), 2.0),
        ],
        axis=1,
    )
    ang = jax.random.uniform(ks[2], (B,), minval=0.0, maxval=2 * jnp.pi)
    d = jnp.stack([0.4 * jnp.cos(ang), 0.4 * jnp.sin(ang), -jnp.ones((B,))], axis=1)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t_k, h_k = jax.block_until_ready(rc(org, d, hf, xy0, cell))
    t_o, h_o = jax.block_until_ready(
        jax.jit(raycast_reference)(org, d, hf, xy0, cell)
    )
    te = np.abs(np.asarray(t_k) - np.asarray(t_o))
    frac = float(np.mean(te < 1e-4))
    # rate
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(rc(org, d, hf, xy0, cell))
        best = min(best, time.perf_counter() - t0)
    emit(
        phase="raycast", ok=bool(lowered and frac > 0.995), mosaic_lowered=lowered,
        frac_t_agree=frac, t_err_max=float(te.max()),
        rays_per_s=round(B / best, 0),
    )


@guarded("monkey_bars")
def phase_monkey():
    import mocca_envs_tpu

    env = mocca_envs_tpu.make("Monkey3DStepperEnv-v0")
    rate, st = throughput(env, B=4096, T=50)
    finite = bool(jnp.all(jnp.isfinite(st.q)))
    emit(phase="monkey_bars", ok=finite, env_steps_per_s=round(rate, 0), finite=finite)


@guarded("throughput")
def phase_throughput():
    import mocca_envs_tpu

    for env_id in ("Walker3DCustomEnv-v0", "CassieEnv-v0", "Walker3DTerrainEnv-v0"):
        env = mocca_envs_tpu.make(env_id)
        rate, st = throughput(env, B=4096, T=50)
        emit(
            phase="throughput", ok=True, env=env_id,
            env_steps_per_s=round(rate, 0),
            vs_north_star=round(rate / 1e6, 3),
        )


if __name__ == "__main__":
    t00 = time.time()
    phase_hf()
    phase_raycast()
    phase_monkey()
    phase_throughput()
    print(f"ALL PHASES DONE in {time.time()-t00:.0f}s", flush=True)
