"""On-TPU validation of the heightfield fused-kernel path (one claim, one run).

1. Mosaic lowering: terrain env batched TILE steps through the fused kernel.
2. Numerics: kernel control-step vs the JAX oracle (use_pallas=False family)
   from identical states over identical per-slot terrains.
3. Throughput: Walker3DTerrainEnv env-steps/s at BENCH batch.

Run:  python scripts/tpu_check_hf.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.tasks.walker_terrain import make_walker3d_terrain
from mocca_envs_tpu.utils.config import EngineConfig

assert jax.default_backend() == "tpu", jax.default_backend()

B = 4096
env = make_walker3d_terrain()
env_oracle = make_walker3d_terrain(config=EngineConfig(use_pallas=False))

keys = rng_mod.env_keys(rng_mod.root_key(0), B)
state = jax.jit(jax.vmap(env.init))(keys)
jax.block_until_ready(state.q)
print("init ok; terrain shapes:", state.scene.hf_height.shape, flush=True)

# ---- numerics: one control step, kernel vs oracle, same inputs
acts = jax.random.uniform(jax.random.key(2), (B, env.act_dim), minval=-1, maxval=1)
t0 = time.perf_counter()
tr_k = jax.jit(jax.vmap(env.step))(state, acts)
jax.block_until_ready(tr_k.state.q)
print(f"kernel step compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
tr_o = jax.jit(jax.vmap(env_oracle.step))(state, acts)
jax.block_until_ready(tr_o.state.q)
print(f"oracle step compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)

qk, qo = np.asarray(tr_k.state.q), np.asarray(tr_o.state.q)
dk, do = np.asarray(tr_k.state.qd), np.asarray(tr_o.state.qd)
rk, ro = np.asarray(tr_k.reward), np.asarray(tr_o.reward)
# distributional gate (like the stones equivalence test): bilinear-cell
# borders have discontinuous NORMALS, so 1-ulp u differences (reciprocal
# mul in-kernel vs divide in the oracle; hardware rsqrt) flip contact
# frames on a handful of envs — bulk agreement is the correctness signal
qe = np.abs(qk - qo).max(axis=1)
de = np.abs(dk - do).max(axis=1)
print("q err:  med %.2e  p99 %.2e  max %.2e  frac<1e-3 %.4f"
      % (np.median(qe), np.quantile(qe, 0.99), qe.max(), float(np.mean(qe < 1e-3))))
print("qd err: med %.2e  p99 %.2e  max %.2e  frac<1e-2 %.4f"
      % (np.median(de), np.quantile(de, 0.99), de.max(), float(np.mean(de < 1e-2))))
print("reward: med %.2e  max %.2e" % (np.median(np.abs(rk - ro)), np.abs(rk - ro).max()))
print("done agree   ", float(np.mean(np.asarray(tr_k.done) == np.asarray(tr_o.done))))
assert float(np.mean(qe < 1e-3)) > 0.97, "kernel/oracle bulk q mismatch"

# ---- 20-step rollout stays finite and on terrain
@functools.partial(jax.jit, donate_argnums=(0,))
def rollout(state, key):
    def body(carry, _):
        st, k = carry
        k, ka = jax.random.split(k)
        a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
        tr = jax.vmap(env.step)(st, a)
        return (tr.state, k), tr.metrics["blowup"].sum()

    (st, k), blow = jax.lax.scan(body, (state, key), None, length=20)
    return st, k, blow.sum()

st, k, blow = rollout(state, jax.random.key(3))
jax.block_until_ready(st.q)
print("20-step rollout: blowups =", float(blow), flush=True)

# ---- throughput
T = 50
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

st, k = timed(st, k)
jax.block_until_ready(st.q)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    st, k = timed(st, k)
    jax.block_until_ready(st.q)
    best = min(best, time.perf_counter() - t0)
print(f"Walker3DTerrainEnv b{B}: {B*T/best:,.0f} env-steps/s (best of 3)")
