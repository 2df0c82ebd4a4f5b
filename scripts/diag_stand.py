"""Can the walker stand under a hand-written PD-hold policy?

RL needs a reachable fixed point: if holding the reset pose with a simple
PD on the torque actions can't stand, no policy can. Pre-fix this fell at
~35 steps; post limit-row fix it should stand indefinitely.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/diag_stand.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.ops.kinematics import joint_q, joint_qd

env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
model = walker3d.make_model()
N, STEPS = 32, 300

keys = rng_mod.env_keys(rng_mod.root_key(0), N)
st = jax.jit(jax.vmap(env.init))(keys)
q0 = jnp.zeros(model.nj)


@jax.jit
def roll(state, kp, kd):
    def body(carry, _):
        s = carry
        qj = jax.vmap(lambda v: joint_q(model, v))(s.q)
        qdj = jax.vmap(lambda v: joint_qd(model, v))(s.qd)
        a = jnp.clip(kp * (q0[None] - qj) - kd * qdj, -1.0, 1.0)
        tr = jax.vmap(env.step)(s, a)
        return tr.state, (tr.reward, tr.done, tr.state.q[:, 2])

    s, (r, d, z) = jax.lax.scan(body, state, None, length=STEPS)
    return r, d, z


for kp, kd in ((2.0, 0.1), (5.0, 0.3), (10.0, 0.5)):
    r, d, z = map(np.asarray, roll(st, kp, kd))
    # survival: first done per env (resets recycle, so count step of first done)
    first_done = np.argmax(d, axis=0).astype(float)
    first_done[~d.any(axis=0)] = STEPS
    print("kp=%4.1f kd=%.1f  mean alive %5.1f/%d  reward/step mean %6.2f p50 %6.2f  z[final] mean %.2f" % (
        kp, kd, first_done.mean(), STEPS, r.mean(), np.percentile(r, 50), z[-1].mean()))
